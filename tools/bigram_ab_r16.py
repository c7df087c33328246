"""Round-16 interleaved A/B for bigram_logprob_quality shapes (verdict #1).

Shapes (all value-identical; ROUND(...,4) absorbs sum-order ulps):
  S0  r15 current: bg window + 2 broadcast unigram joins + BNLJ(tot from cu)
  S3  r14 recon:   bg window + 2 broadcast joins + BNLJ(tot from 2nd explode count)
  S1  r16 cand:    (w1,w2) window, t rides the unigram broadcast via an
                   unpartitioned window sum, symmetric a/b usage so the two
                   broadcast builds canonicalize identically (AQE stage reuse)
  S2  r16 alt:     same but t only from the b side (asymmetric — no reuse)

Interleaved min-of-N per shape in ONE session; noop sink; prints per-shape
mins and whether the executed plan shows reused broadcast stages.
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
    from zarr_climate_etl_ipfs_spark.operators.textanalysis import words
    from zarr_climate_etl_ipfs_spark.plans.queries import t_wide

    d = t_wide(spark, sf_dir, "documents")
    lst = (
        d.select(
            "doc_id", words("text").alias("lst"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        .filter(F.col("_mid") >= 0)
        .drop("_mid")
    )
    pairs = F.expr(
        "zip_with(slice(lst, 1, size(lst)-1), slice(lst, 2, size(lst)-1), "
        "(a, b) -> struct(a AS w1, b AS w2))"
    )
    sp = (
        lst.filter(F.size("lst") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cu = (
        lst.select(F.explode("lst").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    agg = lambda j, p: (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.sum(F.log(p)) / F.count("*"), 4).alias("nll2"),
        )
        .orderBy("doc_id")
    )
    if shape in ("S0", "S3", "S3n"):
        if shape == "S3n":
            spb = sp.withColumn(
                "n2", F.count("*").over(Window.partitionBy("w1", "w2"))
            )
        else:
            spb = sp.withColumn("bg", F.concat_ws(" ", "w1", "w2"))
            spb = spb.withColumn("n2", F.count("*").over(Window.partitionBy("bg")))
        if shape == "S0":
            tot = cu.agg(F.sum("n").alias("t"))
        else:
            tot = lst.select(F.explode("lst").alias("term")).agg(
                F.count("*").alias("t")
            )
        ca = cu.select(F.col("term").alias("w1"), F.col("n").alias("n1"))
        cb = cu.select(F.col("term").alias("w2"), F.col("n").alias("n2u"))
        p = F.lit(0.7) * F.col("n2") / F.col("n1") + F.lit(0.3) * F.col("n2u") / F.col("t")
        return agg(
            spb.join(F.broadcast(ca), "w1")
            .join(F.broadcast(cb), "w2")
            .crossJoin(F.broadcast(tot)),
            p,
        )
    if shape in ("S4", "S5"):
        if shape == "S5":
            base = lst.localCheckpoint(eager=True)
            sp5 = (
                base.filter(F.size("lst") >= 2)
                .select("doc_id", F.explode(pairs).alias("p"))
                .select(
                    "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
                )
            )
            cu5 = (
                base.select(F.explode("lst").alias("term"))
                .groupBy("term")
                .agg(F.count("*").alias("n"))
            )
        else:
            sp5, cu5 = sp, cu
        c2 = sp5.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
        tot = cu5.agg(F.sum("n").alias("t"))
        ca = cu5.select(F.col("term").alias("w1"), F.col("n").alias("n1"))
        cb = cu5.select(F.col("term").alias("w2"), F.col("n").alias("n2u"))
        p = (
            F.lit(0.7) * F.col("n2") / F.col("n1")
            + F.lit(0.3) * F.col("n2u") / F.col("t")
        )
        return agg(
            sp5.join(F.broadcast(c2), ["w1", "w2"])
            .join(F.broadcast(ca), "w1")
            .join(F.broadcast(cb), "w2")
            .crossJoin(F.broadcast(tot)),
            p,
        )
    if shape == "S7":
        # one exchange serves both the (doc,w1,w2) pre-agg and the (w1,w2)
        # window: hashpartitioning(w1,w2) satisfies the agg's clustered
        # distribution (subset key) and the window needs no re-exchange
        dm = (
            sp.repartition("w1", "w2")
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("m"))
            .withColumn("n2", F.sum("m").over(Window.partitionBy("w1", "w2")))
        )
        tot = cu.agg(F.sum("n").alias("t"))
        ca = cu.select(F.col("term").alias("w1"), F.col("n").alias("n1"))
        cb = cu.select(F.col("term").alias("w2"), F.col("n").alias("n2u"))
        p = (
            F.lit(0.7) * F.col("n2") / F.col("n1")
            + F.lit(0.3) * F.col("n2u") / F.col("t")
        )
        j = (
            dm.join(F.broadcast(ca), "w1")
            .join(F.broadcast(cb), "w2")
            .crossJoin(F.broadcast(tot))
        )
        return (
            j.groupBy("doc_id")
            .agg(
                F.sum("m").alias("n_bigrams"),
                F.round(-F.sum(F.col("m") * F.log(p)) / F.sum("m"), 4).alias("nll2"),
            )
            .orderBy("doc_id")
        )
    spw = sp.withColumn("n2", F.count("*").over(Window.partitionBy("w1", "w2")))
    cuw = cu.withColumn("t", F.sum("n").over(Window.partitionBy()))
    a = cuw.alias("a")
    b = cuw.alias("b")
    j = (
        spw.join(F.broadcast(a), F.col("w1") == F.col("a.term"))
        .join(F.broadcast(b), F.col("w2") == F.col("b.term"))
    )
    if shape == "S1":
        texpr = (F.col("a.t") + F.col("b.t")) / F.lit(2)
    else:
        texpr = F.col("b.t")
    p = F.lit(0.7) * F.col("n2") / F.col("a.n") + F.lit(0.3) * F.col("b.n") / texpr
    return agg(j, p)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bigram_ab")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    REGISTRY["pricing_summary"].fn(spark, sf_dir).collect()  # warm

    shapes = sys.argv[1:] or ["S0", "S1", "S2", "S3"]
    # value check first (collect once per shape, compare)
    vals = {}
    for s in shapes:
        vals[s] = [tuple(r) for r in build(spark, sf_dir, s).collect()]
    base = vals[shapes[0]]
    for s in shapes[1:]:
        assert vals[s] == base, f"shape {s} result differs!"
    print(f"values identical across {shapes} ({len(base)} rows)")

    times: dict[str, list[float]] = {s: [] for s in shapes}
    for rep in range(reps):
        for s in shapes:
            spark.sparkContext.setJobDescription(f"bigram {s} rep{rep}")
            t0 = time.perf_counter()
            df = build(spark, sf_dir, s)
            df.write.format("noop").mode("overwrite").save()
            times[s].append(time.perf_counter() - t0)
            if rep == 0:
                ep = df._jdf.queryExecution().executedPlan().toString()
                n_reused = ep.count("ReusedExchange") + ep.count("reused")
                print(f"{s}: executed-plan reuse markers = {n_reused}")
    for s in shapes:
        ts = sorted(times[s])
        print(
            f"{s}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
            f"all={[round(x, 3) for x in times[s]]}"
        )


if __name__ == "__main__":
    main()
