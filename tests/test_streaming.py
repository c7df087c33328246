"""Streaming-surface tests: incremental file-source ingest with offset
tracking, watermarked windows, session windows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import _tall, daily
from zarr_climate_etl_ipfs_spark.sources.store import GridStore
from zarr_climate_etl_ipfs_spark.streaming.incremental import (
    session_stats,
    stream_dedup,
    stream_ingest,
    windowed_stats,
)


def test_stream_dedup_matches_batch(tmp_path, spark):
    """Watermarked streaming dedup (bounded state) agrees with the batch
    dropDuplicates oracle when the event span fits one watermark."""
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    for m in range(30):
        rows.append((m % 10, t0 + dt.timedelta(minutes=m), float(m)))  # key repeats 3x
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    src = tmp_path / "dups"
    df.coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema("k long, ts timestamp, v double").parquet(str(src))
    out_dir = str(tmp_path / "out")
    (
        stream_dedup(stream, ["k"], "ts", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out_dir)
    assert got.count() == 10
    assert {r["k"] for r in got.collect()} == set(range(10))
    # batch fallback: same key set
    batch = stream_dedup(df, ["k"], "ts")
    assert batch.count() == 10


def test_stream_ingest_incremental(tmp_path, spark, desc):
    """Two landing batches → initial publish then append; checkpoint makes the
    second run process only the new file (the offset log replaces the
    reference's newest-file-date poll)."""
    landing = tmp_path / "landing"
    ckpt = str(tmp_path / "ckpt")
    store = GridStore(tmp_path / "store", desc, spark)

    batch1 = spark.createDataFrame(_tall(daily("2021-09-16", 10), seed=1), schema=desc.schema())
    batch1.coalesce(1).write.mode("append").parquet(str(landing))
    stream_ingest(spark, str(landing), store, ckpt)
    assert store.dataset().count() == 10 * 16
    assert [v["action"] for v in store.versions()] == ["initial"]

    batch2 = spark.createDataFrame(_tall(daily("2021-09-26", 5), seed=2), schema=desc.schema())
    batch2.coalesce(1).write.mode("append").parquet(str(landing))
    stream_ingest(spark, str(landing), store, ckpt)
    assert store.dataset().count() == 15 * 16
    actions = [v["action"] for v in store.versions()]
    assert actions == ["initial", "append"]
    store.destroy()


def test_windowed_stats_batch(spark):
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for i in range(120):  # 2 hours of minutely events
        rows.append((t0 + dt.timedelta(minutes=i), float(i)))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = windowed_stats(df, "ts", "v", window="1 hour").orderBy("window_start").collect()
    assert len(out) == 2
    assert out[0]["n"] == 60 and out[1]["n"] == 60
    assert out[0]["mean_value"] == 29.5
    assert out[0]["window_start"] == t0


def test_windowed_stats_streaming_source(tmp_path, spark):
    """Same aggregation through a real readStream source."""
    rows = [(dt.datetime(2024, 1, 1, 0, m), float(m)) for m in range(60)]
    src = tmp_path / "events"
    spark.createDataFrame(rows, "ts timestamp, v double").coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema("ts timestamp, v double").parquet(str(src))
    out_dir = str(tmp_path / "out")
    (
        windowed_stats(stream, "ts", "v", window="30 minutes", watermark="1 second")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out_dir).orderBy("window_start").collect()
    # append mode emits only watermark-closed windows: the last open window
    # (0:30-1:00, watermark 0:59-1s) is correctly retained as state
    assert [r["n"] for r in got] == [30]


def test_session_stats_batch(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (t0, 1), (t0 + dt.timedelta(minutes=5), 1),  # session A: 2 events
        (t0 + dt.timedelta(hours=2), 1),              # session B: 1 event
        (t0, 2),                                      # other user
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user long")
    out = session_stats(df, "ts", "user").orderBy("user", "session_start").collect()
    assert [(r["user"], r["n_events"]) for r in out] == [(1, 2), (1, 1), (2, 1)]


def test_running_anomaly_detector_state_across_batches(tmp_path, spark):
    """applyInPandasWithState: Welford state persists across two AvailableNow
    runs — the second batch's anomaly is judged against the first batch's
    distribution."""
    from zarr_climate_etl_ipfs_spark.streaming.incremental import running_anomaly_detector

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1)

    def run_batch(rows, batch_file):
        spark.createDataFrame(rows, "user_id long, ts timestamp, value double").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(
            str(src)
        )
        (
            running_anomaly_detector(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # batch 1: 50 calm values around 10
    rows1 = [(1, t0 + dt.timedelta(minutes=i), 10.0 + (i % 5) * 0.1) for i in range(50)]
    run_batch(rows1, "b1")
    # batch 2: one wild outlier + one calm value
    rows2 = [(1, t0 + dt.timedelta(hours=2), 500.0), (1, t0 + dt.timedelta(hours=2, minutes=1), 10.2)]
    run_batch(rows2, "b2")

    got = spark.read.parquet(str(out)).orderBy("n_total").collect()
    assert [r["n_batch"] for r in got] == [50, 2]
    assert got[0]["n_anomalies"] == 0
    assert got[1]["n_anomalies"] == 1  # the 500.0 against batch-1 stats
    assert got[1]["n_total"] == 52


def test_zscore_anomalies_exact_state_across_batches(tmp_path, spark):
    """Integer-state z-score op: the second batch is judged against first-
    batch history, and the counts equal the closed-form integer test."""
    from zarr_climate_etl_ipfs_spark.streaming.incremental import zscore_anomalies_exact

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1)

    def run_batch(rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, value double"
        ).parquet(str(src))
        (
            zscore_anomalies_exact(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # batch 1: twelve values in 10.00..10.40 — builds history past min_history
    rows1 = [
        (1, t0 + dt.timedelta(minutes=i), i, 10.0 + (i % 5) * 0.1) for i in range(12)
    ]
    run_batch(rows1)
    # batch 2: an outlier and a calm value
    rows2 = [
        (1, t0 + dt.timedelta(hours=2), 100, 500.0),
        (1, t0 + dt.timedelta(hours=2, minutes=1), 101, 10.2),
    ]
    run_batch(rows2)

    got = spark.read.parquet(str(out)).orderBy("n_batch").collect()
    # batch 1: rows 10 and 11 have history (n>=10) but sit ~1.4 sigma from the
    # mean — no anomaly; batch 2: 500.0 against batch-1 state is the only flag
    assert [(r["n_batch"], r["n_anomalies"]) for r in got] == [(2, 1), (12, 0)]
    # closed-form integer check for both decisions
    cents = [1000 + (i % 5) * 10 for i in range(12)]
    n = 10
    s = sum(cents[:n]); q = sum(c * c for c in cents[:n])
    assert (cents[10] * n - s) ** 2 <= 9 * (n * q - s * s)  # calm row: no flag
    n2, v2 = 12, 50000
    s2 = sum(cents); q2 = sum(c * c for c in cents)
    assert (v2 * n2 - s2) ** 2 > 9 * (n2 * q2 - s2 * s2)  # the 500.0 flag


def test_cusum_drift_state_across_batches(tmp_path, spark):
    """Page CUSUM drift op: the baseline learned in batch 1 judges batch 2's
    drift, alarms fire exactly where the closed-form integer recurrence
    says, and the running max survives the batch boundary."""
    from zarr_climate_etl_ipfs_spark.streaming.incremental import cusum_drift

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1)

    def run_batch(rows):
        spark.createDataFrame(
            rows, "event_type string, ts timestamp, event_id long, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(
            "event_type string, ts timestamp, event_id long, value double"
        ).parquet(str(src))
        (
            cusum_drift(stream, baseline_n=4, slack_cents=10, h_cents=100)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    # batch 1: 4 baseline values at 10.00 + two calm post values
    rows1 = [("a", t0 + dt.timedelta(minutes=i), i, 10.0) for i in range(4)]
    rows1 += [
        ("a", t0 + dt.timedelta(minutes=10), 10, 10.05),
        ("a", t0 + dt.timedelta(minutes=11), 11, 10.0),
    ]
    run_batch(rows1)
    # batch 2: sustained +2.00 drift — CUSUM accumulates past h
    rows2 = [
        ("a", t0 + dt.timedelta(hours=1, minutes=i), 100 + i, 12.0) for i in range(4)
    ]
    run_batch(rows2)

    got = {r["n_batch"]: r for r in spark.read.parquet(str(out)).collect()}
    # closed-form replay: cents baseline sum B=4000, d = 4c - B - 40
    def replay(cents_seq):
        p = minp = max_s = alarms = 0
        for c in cents_seq:
            p += 4 * c - 4000 - 40
            minp = min(minp, p)
            s = p - min(0, minp)
            max_s = max(max_s, s)
            alarms += s > 400
        return alarms, max_s

    a1, m1 = replay([1005, 1000])
    a2, m2 = replay([1005, 1000, 1200, 1200, 1200, 1200])
    assert (got[2]["n_alarms"], got[2]["max_s"]) == (a1, m1)
    assert got[4]["n_alarms"] == a2 - a1
    assert got[4]["max_s"] == m2
    assert a2 > 0  # the drift actually fired


def test_running_extremes_v2_state_across_batches(tmp_path, spark):
    """transformWithStateInPandas (arbitrary-state v2): ValueState persists
    across availableNow runs; second batch's output reflects first-batch
    extremes. Skips where Spark's TWS driver worker can't start (needs a
    working protobuf install)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from zarr_climate_etl_ipfs_spark.streaming.incremental import running_extremes_v2

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 1, 1)
    # transformWithState requires a state store with column families —
    # RocksDB (bundled rocksdbjni), not the default HDFS-backed provider
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def run_batch(rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp, value double").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(
            str(src)
        )
        (
            running_extremes_v2(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    try:
        run_batch([(1, t0, 10.25), (1, t0 + dt.timedelta(minutes=1), 3.5), (2, t0, 7.0)])
        run_batch([(1, t0 + dt.timedelta(hours=1), 99.99)])
    finally:
        if old_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old_prov)
    got = sorted(
        [(r["user_id"], r["n_total"], r["min_cents"], r["max_cents"])
         for r in spark.read.parquet(str(out)).collect()]
    )
    # user 1 appears once per batch; second emission carries batch-1 state
    assert got == [(1, 2, 350, 1025), (1, 3, 350, 9999), (2, 1, 700, 700)]


def test_running_extremes_v1_state_across_batches(tmp_path, spark):
    """v1-API running extremes: state survives micro-batch boundaries and the
    monotone max/min/max collapse over per-batch snapshots recovers the
    exact batch GROUP BY result."""
    import pyspark.sql.functions as F

    from zarr_climate_etl_ipfs_spark.streaming.incremental import running_extremes

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ck")

    def run_batch(rows):
        spark.createDataFrame(rows, "user_id long, value double").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        stream = spark.readStream.schema("user_id long, value double").parquet(str(src))
        (
            running_extremes(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_batch([(1, 10.0), (1, 12.5), (2, -3.341)])
    # 9.995*100 is 999.4999… in binary float, so floor(+0.5) yields 999 —
    # the SAME expression the SQL oracle evaluates, which is the parity
    # that matters (not decimal round-half-up intuition)
    run_batch([(1, 9.995), (2, 100.0)])

    got = {
        r.user_id: (r.n_total, r.min_cents, r.max_cents)
        for r in spark.read.parquet(str(out))
        .groupBy("user_id")
        .agg(
            F.max("n_total").alias("n_total"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
        .collect()
    }
    assert got[1] == (3, 999, 1250)
    assert got[2] == (2, -334, 10000)


def test_running_extremes_v1_v2_identical_output(tmp_path, spark):
    """The v1 (applyInPandasWithState) and v2 (transformWithStateInPandas)
    running-extremes operators must emit IDENTICAL rows over identical
    micro-batch sequences — the round-6/7 ask that the v2 twin is proven
    equivalent, not just present."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from zarr_climate_etl_ipfs_spark.streaming.incremental import (
        running_extremes,
        running_extremes_v2,
    )

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    batches = [
        [(1, 10.25), (1, 3.5), (2, 7.0), (3, -0.005)],
        [(1, 99.99), (3, 42.0)],
        [(2, 7.0), (2, 6.999)],
    ]

    def drive(op, tag):
        src = tmp_path / f"src_{tag}"
        out = tmp_path / f"out_{tag}"
        ckpt = str(tmp_path / f"ck_{tag}")
        for rows in batches:
            spark.createDataFrame(rows, "user_id long, value double").coalesce(
                1
            ).write.mode("append").parquet(str(src))
            stream = spark.readStream.schema("user_id long, value double").parquet(
                str(src)
            )
            (
                op(stream)
                .writeStream.format("parquet")
                .option("path", str(out))
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
        return sorted(
            (r.user_id, r.n_total, r.min_cents, r.max_cents)
            for r in spark.read.parquet(str(out)).collect()
        )

    try:
        v1 = drive(running_extremes, "v1")
        v2 = drive(running_extremes_v2, "v2")
    finally:
        if old_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, old_prov)
    assert v1 == v2
    # and both carry state across batches: user 1's final snapshot spans all runs
    assert (1, 3, 350, 9999) in v1


def test_windowed_stats_nan_excluded_from_mean(spark):
    """NaN is 'missing' for null_share, so it must be missing for mean_value
    too: avg() skips NULL but would propagate NaN, making the same missing
    datum yield a valid or NaN mean depending on representation (round-14
    review catch)."""
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (t0, 10.0),
        (t0 + dt.timedelta(minutes=1), float("nan")),
        (t0 + dt.timedelta(minutes=2), None),
        (t0 + dt.timedelta(minutes=3), 20.0),
    ]
    out = windowed_stats(
        spark.createDataFrame(rows, "ts timestamp, v double"), "ts", "v"
    ).collect()
    assert len(out) == 1
    assert out[0]["n"] == 4
    assert out[0]["mean_value"] == 15.0  # (10+20)/2 — NaN and NULL excluded
    assert out[0]["null_share"] == 0.5
