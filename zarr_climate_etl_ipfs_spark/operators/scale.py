"""Scale-path utilities: skew salting, bucketed co-located joins, Z-order
clustering. These are the hand-tuning levers the build brief names for the
100 TB tier — each is a small, testable plan transformation, not a framework.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Skew-salted join
# ---------------------------------------------------------------------------


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys: the (large, skewed) left side gets a
    random salt in [0, salt); the (smaller) right side is replicated salt×
    with every salt value. The shuffle key becomes (key, salt), splitting a
    hot key's rows across ``salt`` reducers.

    AQE's skew-join handles sort-merge skew automatically; explicit salting
    still matters when the skew is in a *hash aggregation* feeding the join,
    or when AQE is unavailable (streaming state, custom partitioners).
    Result equals a plain join (verified in tests).

    Only inner/left joins are allowed: replicating the right side salt×
    would multiply unmatched right rows under right/full outer semantics.
    The salt is derived deterministically (xxhash64 over the left row), so
    task retries and AQE re-plans reproduce the same bucket assignment —
    F.rand can re-deal rows across attempts. Rows that are full duplicates
    share a bucket; for corpora where the hot key's rows are *identical*,
    include a unique id column in the frame before salting.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: a "
            "salt-replicated right side breaks right/full outer semantics"
        )
    lsalt = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    rsalt = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = lsalt.join(rsalt, [on, "_salt"], how)
    return out.drop("_salt")


def two_phase_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Skew-safe groupBy count: pre-aggregate on (key, salt) then combine.
    Spark's partial aggregation already does this for counts; the explicit
    form is the template for aggregates without map-side combine (e.g.
    collect_list-ish accumulations)."""
    pre = (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int"),
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return pre.groupBy(key).agg(F.sum("_c").alias("n"))


# ---------------------------------------------------------------------------
# Bucketed (pre-shuffled) tables for co-located joins
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed table: the one-time shuffle at write time buys
    every later equi-join on ``key`` a shuffle-free plan (both sides
    bucket-aligned → SortMergeJoin with no Exchange). This is the Spark
    analog of co-partitioned storage layouts. ``path`` makes it an external
    table (warehouse dir is a static conf, so tests pass a tmp path)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed_join(spark, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark plans
    no Exchange on either side (asserted in tests via the physical plan)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def zorder_index(
    lat: Column | str,
    lon: Column | str,
    lat_min: float = -90.0,
    lat_max: float = 90.0,
    lon_min: float = -180.0,
    lon_max: float = 180.0,
    bits: int = 16,
) -> Column:
    """Morton (Z-order) index over a lat/lon box: quantize each coordinate to
    ``bits`` bits and interleave them. Sorting files by this column makes
    row-group (min,max) ranges cover *compact spatial tiles*, so a lat AND
    lon predicate prunes row groups multiplicatively instead of only on the
    leading sort column — the Delta ZORDER BY effect, as a plain expression.
    """
    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    scale = (1 << bits) - 1
    qa = F.round((la - F.lit(lat_min)) / F.lit(lat_max - lat_min) * scale, 0).cast("long")
    qo = F.round((lo - F.lit(lon_min)) / F.lit(lon_max - lon_min) * scale, 0).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(qa, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(qo, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z
