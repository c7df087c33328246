"""Stage-level timing breakdown of the ROUND-7 embedding_lsh_neardups plan
(round-7 judge ask #3) — kept as the measurement record that motivated the
round-8 rebuild, NOT a profile of the shipped query.

The stages below hand-inline the r7 plan (including the `cand_dedup`
dropDuplicates stage the rebuild deleted); the shipped plan in
plans/queries.py uses min-band dedup and a bucket-level repartition
instead, with the before/after numbers recorded in its docstring. To
profile the CURRENT query end-to-end, time
``REGISTRY["embedding_lsh_neardups"].fn`` directly.

Usage: python tools/profile_lsh.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def timed(df, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile_lsh")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from zarr_climate_etl_ipfs_spark.functions.vectors import dot, l2_norm
    from zarr_climate_etl_ipfs_spark.operators.similarity import (
        rademacher_planes,
        srp_signature_expr,
    )
    from zarr_climate_etl_ipfs_spark.plans.queries import t_wide, tune

    tune(spark)
    emb = t_wide(spark, sf_dir, "embeddings")
    emb.write.format("noop").mode("overwrite").save()  # warm scan cache/JIT

    planes = rademacher_planes(16, 64, seed=42)

    def sig_df():
        return emb.select(
            "vec_id",
            "embedding",
            l2_norm("embedding").alias("_n"),
            srp_signature_expr("embedding", planes).alias("sig"),
        )

    def banded_df(s):
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("sig", 4 * b).bitwiseAND(F.lit(15)).alias("bv"),
                )
                for b in range(4)
            ]
        )
        return s.select("vec_id", F.explode(bands).alias("bb")).select(
            "vec_id", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
        )

    def buckets_df(s):
        return (
            banded_df(s)
            .groupBy("band", "bv")
            .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )

    def pairs_df(s):
        return buckets_df(s).select(
            F.explode_outer(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda x, i: F.transform(
                            F.slice("ids", i + 2, F.size("ids")),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.id_a", "p.id_b")

    def cand_df(s):
        return pairs_df(s).dropDuplicates(["id_a", "id_b"]).repartition(
            spark.sparkContext.defaultParallelism
        )

    def verified_df(s):
        cand = cand_df(s)
        va = s.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("va"),
            F.col("_n").alias("na"),
        )
        vb = s.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vb"),
            F.col("_n").alias("nb"),
        )
        cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            cand.join(F.broadcast(va), "id_a")
            .join(F.broadcast(vb), "id_b")
            .withColumn("_c", cos)
            .filter(F.col("_c") >= 0.35)
            .select("id_a", "id_b", F.round("_c", 4).alias("cosine"))
        )

    def full_df(s):
        return verified_df(s).repartition(
            spark.sparkContext.defaultParallelism
        ).orderBy("id_a", "id_b")

    stages = [
        ("scan_only", lambda: emb.select("vec_id")),
        ("signature", sig_df),
        ("banded_explode", lambda: banded_df(sig_df())),
        ("bucket_agg", lambda: buckets_df(sig_df())),
        ("pair_gen", lambda: pairs_df(sig_df())),
        ("cand_dedup", lambda: cand_df(sig_df())),
        ("verify", lambda: verified_df(sig_df())),
        ("full_with_sort", lambda: full_df(sig_df())),
    ]
    results = {}
    for name, mk in stages:
        results[name] = timed(mk(), reps)
        print(f"{name:>16}: {results[name]:.3f} s")
    prev = 0.0
    print("\nincremental:")
    for name, _ in stages:
        print(f"{name:>16}: +{results[name] - prev:.3f} s")
        prev = results[name]


if __name__ == "__main__":
    main()
