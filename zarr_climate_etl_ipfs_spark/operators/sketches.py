"""Mergeable sketch operators — the approximate layer for 100 TB profiling.

Exact distinct counts and exact percentiles need a global shuffle of every
value; sketches give bounded-error answers with map-side-combinable state a
few KB per group. Spark ships the hard parts (Apache DataSketches HLL,
an approximate-percentile digest); these wrappers pin the engine's usage
pattern: build per-partition/per-bucket sketches once, persist them next to
the data, and answer later queries by *merging sketches* instead of
rescanning rows — the same incremental-refresh shape as
operators/rollup.py, generalized to approximate aggregates.

No catalog entries: approximate results cannot hash-match a DuckDB oracle
(different sketch implementations); the tests assert error bounds and the
merge identity (sketch(A ∪ B) == merge(sketch(A), sketch(B))) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches of ``value_col`` cardinality: (keys, hll)
    rows. The binary sketch column is the *state*, not the answer — store
    it; relative error ≈ 1.04/√2^lg_k (~1.6% at the default)."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll")
    )


def distinct_estimate(sketches: DataFrame, key_cols: list[str]) -> DataFrame:
    """Union the per-group sketches down to any coarser grouping and read
    the estimate — rescan-free rollup of a distinct count (which is NOT
    otherwise summable across groups)."""
    return (
        sketches.groupBy(*key_cols)
        .agg(F.hll_union_agg("hll").alias("hll"))
        .withColumn("n_distinct_est", F.hll_sketch_estimate("hll"))
        .drop("hll")
    )


def quantile_profile(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles in one pass (no global sort; state is
    a bounded digest). ``accuracy`` is the 1/eps knob: rank error ≤ 1/accuracy."""
    q = F.percentile_approx(
        F.col(value_col), F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )
    out = df.groupBy(*key_cols).agg(q.alias("_q"))
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"p{int(p * 100)}", F.col("_q")[i])
    return out.drop("_q")


def value_histogram(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] = (),
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram as a groupBy (two passes only when bounds are
    not given; at scale pass known bounds and it is one map-side-combinable
    aggregation). Returns (keys, bin, bin_lo, n)."""
    if lo is None or hi is None:
        b = df.agg(F.min(value_col).alias("lo"), F.max(value_col).alias("hi")).first()
        lo = float(b["lo"]) if lo is None else lo
        hi = float(b["hi"]) if hi is None else hi
    width = (hi - lo) / n_bins or 1.0
    bin_col: Column = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    return (
        df.withColumn("bin", bin_col)
        .groupBy(*key_cols, "bin")
        .agg(F.count("*").alias("n"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(width))
        .orderBy(*key_cols, "bin")
    )
