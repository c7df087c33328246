"""Similarity search over embedding columns (array<float>).

Two tiers (BASELINE.json north star):

  brute-force   exact cosine top-k — the correctness baseline. Scales as a
                single scan + TakeOrderedAndProject when the query set is
                broadcastable (the common case: few query vectors vs many
                candidates).
  LSH-bucketed  random-hyperplane signature buckets; candidates only join
                within a bucket (multi-probe over signature bands). The
                100 TB path: shuffle keys are (band, sig), never a cross
                join.

An IVF variant (k-means coarse quantizer) is intentionally deferred: the
hyperplane LSH gives the same plan shape without an iterative training job.
All vector math is JVM-side (functions/vectors.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.functions.vectors import cosine_similarity, dot, l2_norm


def brute_force_topk(
    candidates: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Plan: broadcast the query set, one pass over candidates computing cosine
    in codegen, per-query ranking window. With a single query row the window
    degenerates to TakeOrderedAndProject (no shuffle of candidates)."""
    q = F.broadcast(
        query.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    )
    scored = candidates.crossJoin(q).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def hyperplane_signature(vec: Column | str, n_planes: int = 16, seed: int = 42, dim: int = 64) -> Column:
    """Sign-random-projection signature: bit i = sign(v · rᵢ) where rᵢ is a
    deterministic pseudo-random hyperplane derived from (seed, i, component).

    The hyperplanes are generated *inside the expression* from hash values —
    no driver-side randomness, no broadcast of a plane matrix, identical
    across runs and engines that share the hash.
    """
    v = F.col(vec) if isinstance(vec, str) else vec

    def plane_dot(i: int) -> Column:
        # component j of plane i ∈ {-1, +1} from xxhash64(seed, i, j):
        # a Rademacher projection, which preserves cosine structure like
        # Gaussian planes do.
        comps = F.transform(
            v,
            lambda x, j: x.cast("double")
            * F.when(F.xxhash64(F.lit(seed), F.lit(i), j) % 2 == 0, 1.0).otherwise(-1.0),
        )
        return F.aggregate(comps, F.lit(0.0), lambda acc, x: acc + x)

    out = F.lit(0).cast("long")
    for i in range(n_planes):
        out = out + F.when(plane_dot(i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def lsh_topk(
    candidates: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    bands: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates and queries hashed to hyperplane
    signatures split into bands; exact cosine only for candidates sharing at
    least one band with the query (multi-probe recall knob = bands)."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1

    def with_bands(df: DataFrame, idc: str) -> DataFrame:
        sig = hyperplane_signature(vec_col, n_planes)
        bandcols = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(sig, b * bits_per_band)
                    .bitwiseAND(F.lit(mask))
                    .alias("bsig"),
                )
                for b in range(bands)
            ]
        )
        return df.select(idc, vec_col, F.explode(bandcols).alias("bb")).select(
            idc, vec_col, F.col("bb.band").alias("band"), F.col("bb.bsig").alias("bsig")
        )

    cb = with_bands(candidates, id_col)
    qb = with_bands(
        query.select(F.col(query_id_col), F.col(vec_col)), query_id_col
    ).withColumnRenamed(vec_col, "_qvec")
    matched = (
        cb.join(F.broadcast(qb), ["band", "bsig"])
        .select(query_id_col, id_col, vec_col, "_qvec")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = matched.select(
        query_id_col, id_col, cosine_similarity(F.col(vec_col), F.col("_qvec")).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Same banded-signature bucketing as lsh_topk but self-joined: near-
    identical vectors agree on most sign bits, so they collide in ≥1 band
    with high probability; exact cosine verifies in-bucket."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sig = hyperplane_signature(vec_col, n_planes)
    banded = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(sig, b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "vec", F.col("bb.band").alias("band"), F.col("bb.bsig").alias("bsig"))
    a = banded.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "band", "bsig")
    b = banded.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "band", "bsig")
    pairs = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", cosine_similarity(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    return pairs
