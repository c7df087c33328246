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
