"""Round-16 interleaved A/B for ngram_jaccard_pairs shapes.

The current plan executes the scan -> explode -> window(g) subtree FOUR
times statically (a side, b side's broadcast build, sa, sb); AQE stage
reuse recovers some of that at runtime but the sort-based window and the
duplicated aggregates remain. Shapes (all value-identical — the DF cap is
a pure filter however it is computed):

  N0  current: window df-cap, sizes agg + two broadcast joins
  N1  N0 with the capped posting list localCheckpoint'ed (explode+window
      run ONCE; a/b/sizes all scan the checkpoint blocks)
  N2  checkpoint the RAW posting list, df-cap as a broadcast ANTI-join of
      the hot grams (no Sort+Window at all; hot-gram agg is map-side
      combinable and tiny), sizes/a/b from the filtered checkpoint
  N3  N2 but cap via window on the checkpoint (isolates checkpoint vs
      anti-join effects)

Interleaved min-of-N in one session; noop sink; value identity asserted.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def build(spark, sf_dir, shape: str) -> DataFrame:
    from zarr_climate_etl_ipfs_spark.operators.dedup import md5int, shingles_from_words
    from zarr_climate_etl_ipfs_spark.operators.textanalysis import words
    from zarr_climate_etl_ipfs_spark.plans.queries import t_wide

    d = t_wide(spark, sf_dir, "documents").withColumn("w", words("text")).select(
        F.col("doc_id"), F.transform(shingles_from_words("w"), md5int).alias("grams")
    )
    ex = d.select("doc_id", F.explode_outer("grams").alias("g")).filter(
        F.col("g").isNotNull()
    )
    if shape == "N0":
        kept = (
            ex.withColumn("df", F.count("*").over(Window.partitionBy("g")))
            .filter(F.col("df") <= 64)
            .drop("df")
        )
    elif shape == "N1":
        kept = (
            ex.withColumn("df", F.count("*").over(Window.partitionBy("g")))
            .filter(F.col("df") <= 64)
            .drop("df")
            .localCheckpoint(eager=True)
        )
    elif shape == "N2":
        exc = ex.localCheckpoint(eager=True)
        hot = exc.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") > 64)
        kept = exc.join(F.broadcast(hot.select("g")), "g", "left_anti")
    elif shape == "N3":
        exc = ex.localCheckpoint(eager=True)
        kept = (
            exc.withColumn("df", F.count("*").over(Window.partitionBy("g")))
            .filter(F.col("df") <= 64)
            .drop("df")
        )
    else:
        raise ValueError(shape)
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = kept.select(F.col("doc_id").alias("id_a"), "g")
    b = kept.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("AB_REPS", "6"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ngram_ab")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    REGISTRY["pricing_summary"].fn(spark, sf_dir).collect()  # warm

    shapes = sys.argv[1:] or ["N0", "N1", "N2", "N3"]
    vals = {}
    for s in shapes:
        vals[s] = [tuple(r) for r in build(spark, sf_dir, s).collect()]
    base = vals[shapes[0]]
    for s in shapes[1:]:
        assert vals[s] == base, f"shape {s} result differs!"
    print(f"values identical across {shapes} ({len(base)} rows)", flush=True)

    times: dict[str, list[float]] = {s: [] for s in shapes}
    for rep in range(reps):
        for s in shapes:
            spark.sparkContext.setJobDescription(f"ngram {s} rep{rep}")
            t0 = time.perf_counter()
            df = build(spark, sf_dir, s)
            df.write.format("noop").mode("overwrite").save()
            times[s].append(time.perf_counter() - t0)
            if rep == 0:
                ep = df._jdf.queryExecution().executedPlan().toString()
                print(
                    f"{s}: Window={ep.count('Window')} "
                    f"Exchange={ep.count('Exchange')} "
                    f"Scan parquet={ep.count('Scan parquet')} "
                    f"ExistingRDD={ep.count('Scan ExistingRDD')}",
                    flush=True,
                )
    for s in shapes:
        ts = sorted(times[s])
        print(
            f"{s}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
            f"all={[round(x, 3) for x in times[s]]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
