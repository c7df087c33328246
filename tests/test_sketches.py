"""Sketch operators: error bounds and the merge identity (the property that
makes sketches the scale path — union of stored sketches == sketch of the
union, no rescan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.operators.sketches import (
    distinct_estimate,
    distinct_sketch,
    quantile_profile,
    value_histogram,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    from zarr_climate_etl_ipfs_spark.plans.queries import t

    return t(spark, SF, "events")


def test_hll_estimate_within_bound(spark, events):
    sk = distinct_sketch(events, ["event_type"], "user_id")
    est = {r["event_type"]: r["n_distinct_est"] for r in distinct_estimate(sk, ["event_type"]).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, n in exact.items():
        assert est[k] == pytest.approx(n, rel=0.05), k


def test_hll_merge_identity(spark, events):
    """sketch(A ∪ B) == union(sketch(A), sketch(B)) — per-bucket sketches
    roll up to the global answer without touching rows again."""
    per_type = distinct_sketch(events, ["event_type"], "user_id")
    merged = distinct_estimate(per_type.withColumn("all", F.lit(1)), ["all"])
    direct = distinct_estimate(
        distinct_sketch(events.withColumn("all", F.lit(1)), ["all"], "user_id"), ["all"]
    )
    assert merged.first()["n_distinct_est"] == direct.first()["n_distinct_est"]


def test_quantile_profile_ranks(spark, events):
    prof = {r["event_type"]: r for r in quantile_profile(events, ["event_type"], "value").collect()}
    exact = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    for r in exact.collect():
        got = prof[r["event_type"]]
        assert got["p50"] == pytest.approx(r["p50"], rel=0.02)
        assert got["p99"] == pytest.approx(r["p99"], rel=0.02)
    assert all(p["p50"] <= p["p90"] <= p["p99"] for p in prof.values())


def test_value_histogram_partitions_all_rows(spark, events):
    h = value_histogram(events, "value", key_cols=["event_type"], n_bins=10)
    rows = h.collect()
    assert sum(r["n"] for r in rows) == events.count()
    assert all(0 <= r["bin"] < 10 for r in rows)
    # bins are ordered and non-overlapping per key
    per_key: dict[str, list[int]] = {}
    for r in rows:
        per_key.setdefault(r["event_type"], []).append(r["bin"])
    for bins in per_key.values():
        assert bins == sorted(bins) and len(set(bins)) == len(bins)


# --- engine-portable sketches (oracle-checkable family) ---


def test_portable_hll_bound_and_merge(spark, events):
    """Portable HLL: estimate within ~3 sigma of 1.04/sqrt(512), and the
    merge identity — MAX-merging per-shard registers equals the registers
    of the union (the property that makes it a 100 TB primitive)."""
    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        portable_hll_estimate,
        portable_hll_registers,
    )

    regs = portable_hll_registers(events, ["event_type"], "user_id")
    est = {
        r["event_type"]: r["distinct_est"]
        for r in portable_hll_estimate(regs, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 3 * 1.04 / (512 ** 0.5), (k, est[k], n)
    # merge identity: split on event_id parity, MAX-merge, same registers
    a = portable_hll_registers(events.filter("event_id % 2 = 0"), ["event_type"], "user_id")
    b = portable_hll_registers(events.filter("event_id % 2 = 1"), ["event_type"], "user_id")
    merged = (
        a.unionByName(b)
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    full = regs
    sym_diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert sym_diff == 0


def test_bloom_no_false_negatives(spark):
    """Every value actually in the build set must probe true; the FP share
    on disjoint values stays under the (1-e^-kn/m)^k envelope ×2 slack."""
    import math

    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        bloom_bit_positions,
        bloom_probe,
    )

    build = spark.range(0, 500).select(F.concat(F.lit("in-"), "id").alias("v"))
    pos = bloom_bit_positions(build, "v", m_bits=8192, k=3)
    hits = {r["v"]: r["bloom_hit"] for r in bloom_probe(build, "v", pos, 8192, 3).collect()}
    assert all(hits.values())
    out = spark.range(0, 2000).select(F.concat(F.lit("out-"), "id").alias("v"))
    fp = [r for r in bloom_probe(out, "v", pos, 8192, 3).collect() if r["bloom_hit"]]
    envelope = (1 - math.exp(-3 * 500 / 8192)) ** 3
    assert len(fp) / 2000 < 2 * envelope + 0.01


def test_bloom_bitmask_probe_matches_join_probe(spark):
    """The r15 join-free bitmask probe (bloom_bitmask + bloom_hit_mask)
    must flag exactly the same values as the relational bloom_probe —
    including with an UNDEDUPED positions frame (bit_or is idempotent),
    covering every bit word incl. the sign bit (bit 63), and reporting
    all-false from an EMPTY build set."""
    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        bloom_bit_positions,
        bloom_bitmask,
        bloom_hit_mask,
        bloom_probe,
    )

    build = spark.range(0, 500).select(F.concat(F.lit("in-"), "id").alias("v"))
    probe = (
        spark.range(0, 500).select(F.concat(F.lit("in-"), "id").alias("v"))
        .union(spark.range(0, 1000).select(F.concat(F.lit("out-"), "id").alias("v")))
    )
    pos = bloom_bit_positions(build, "v", m_bits=8192, k=3)
    expected = {
        r["v"]: r["bloom_hit"] for r in bloom_probe(probe, "v", pos, 8192, 3).collect()
    }
    pos_raw = bloom_bit_positions(build, "v", m_bits=8192, k=3, dedup=False)
    mask = F.broadcast(bloom_bitmask(pos_raw, m_bits=8192))
    got = {
        r["v"]: r["h"]
        for r in probe.crossJoin(mask)
        .select("v", bloom_hit_mask("v", "bits", 8192, 3).alias("h"))
        .collect()
    }
    assert got == expected and any(got.values()) and not all(got.values())

    # empty build set: nothing probes true (positions frame is empty)
    empty_pos = bloom_bit_positions(build.filter("1=0"), "v", 1024, 3, dedup=False)
    em = F.broadcast(bloom_bitmask(empty_pos, m_bits=1024))
    got_e = (
        probe.limit(5).crossJoin(em)
        .select(bloom_hit_mask("v", "bits", 1024, 3).alias("h"))
        .collect()
    )
    assert len(got_e) == 5 and not any(r["h"] for r in got_e)


def test_countmin_one_sided_and_mergeable(spark):
    """cm_est >= true count for EVERY term (never under), and cell-wise
    summing shard sketches equals the whole-corpus sketch."""
    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    tf = spark.range(0, 300).select(
        F.concat(F.lit("t"), (F.col("id") % 37)).alias("term")
    ).groupBy("term").agg(F.count("*").alias("n"))
    sk = countmin_sketch(tf, "term", count_col="n")
    est = countmin_estimate(sk, tf, "term").collect()
    assert all(r["cm_est"] >= r["n"] for r in est)
    a = countmin_sketch(tf.filter("n % 2 = 0"), "term", count_col="n")
    b = countmin_sketch(tf.filter("n % 2 = 1"), "term", count_col="n")
    merged = a.unionByName(b).groupBy("row", "col").agg(F.sum("n").alias("n"))
    sym_diff = merged.exceptAll(sk).count() + sk.exceptAll(merged).count()
    assert sym_diff == 0


def test_bloom_probe_duplicate_rows_no_false_negative(spark):
    """Round-7 review regression: duplicate probe rows merged by the
    membership groupBy must still probe TRUE for values in the filter
    (a sum(hit)==k test saw 2k hits and reported a false negative)."""
    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        bloom_bit_positions,
        bloom_probe,
    )

    build = spark.createDataFrame([("x",), ("y",)], "v string")
    pos = bloom_bit_positions(build, "v", m_bits=1024, k=3)
    dup = spark.createDataFrame([("x",), ("x",), ("z",)], "v string")
    got = {r.v: r.bloom_hit for r in bloom_probe(dup, "v", pos, 1024, 3).collect()}
    assert got["x"] is True


def test_countmin_estimate_missing_term_reports_zero(spark):
    """Round-7 review regression: probing a term absent from the build
    corpus must report cm_est=0 (or an overestimate from collisions),
    never silently vanish from the output."""
    from zarr_climate_etl_ipfs_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    tf = spark.createDataFrame([("alpha", 5)], "term string, cnt long")
    sk = countmin_sketch(tf, "term", count_col="cnt", width=4096)
    probe = spark.createDataFrame(
        [("alpha",), ("never-seen-term",)], "term string"
    )
    got = {r.term: r.cm_est for r in countmin_estimate(sk, probe, "term", width=4096).collect()}
    assert got["alpha"] >= 5
    assert "never-seen-term" in got and got["never-seen-term"] >= 0
