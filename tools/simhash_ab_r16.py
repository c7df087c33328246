"""Round-16 interleaved A/B for simhash_neardups (verdict #3): fold the vote
kernel's two join-side consumers onto one materialized frame.

Shapes (value-identical):
  H0   r15 current: kernel -> repartition(n_part, doc_id) barrier -> join ->
       repartition -> orderBy
  H1a  kernel -> repartition(n_part, doc_id) -> localCheckpoint (kernel runs
       ONCE, at checkpoint time) -> join -> repartition -> orderBy
  H1b  kernel -> localCheckpoint (no barrier exchange) -> join -> repartition
       -> orderBy
  H2   H1a without the final repartition (orderBy samples re-run the join
       from the checkpoint)

Interleaved min-of-N in one session; noop sink; value identity asserted.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build(spark, sf_dir, shape: str) -> DataFrame:
    from zarr_climate_etl_ipfs_spark.operators.dedup import (
        hamming_blocked_pairs,
        md5int,
        simhash_vote_kernel,
    )
    from zarr_climate_etl_ipfs_spark.operators.textanalysis import words
    from zarr_climate_etl_ipfs_spark.plans.queries import _doc_bytes, t_wide

    d = t_wide(spark, sf_dir, "documents")
    hvs = d.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        F.transform(F.array_distinct(words("text")), lambda w: md5int(w)).alias("hvs"),
    )
    n_part = max(8, spark.sparkContext.defaultParallelism // 4)
    sig = hvs.select("doc_id", simhash_vote_kernel("hvs", bits=56).alias("simhash"))
    if shape == "H0":
        sh = sig.repartition(n_part, "doc_id")
    elif shape == "H1a":
        sh = sig.repartition(n_part, "doc_id").localCheckpoint(eager=True)
    elif shape == "H1b":
        sh = sig.localCheckpoint(eager=True)
    elif shape == "H2":
        sh = sig.repartition(n_part, "doc_id").localCheckpoint(eager=True)
    else:
        raise ValueError(shape)
    out = hamming_blocked_pairs(
        sh, id_col="doc_id", sig_col="simhash", max_hamming=2, bits=56,
        bucket_cap=None,
        engine="mih" if _doc_bytes(sf_dir) > 2_000_000 else "join",
    ).select("id_a", "id_b", "hamming")
    if shape != "H2":
        out = out.repartition(spark.sparkContext.defaultParallelism)
    return out.orderBy("id_a", "id_b")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("AB_REPS", "6"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("simhash_ab")
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

    shapes = sys.argv[1:] or ["H0", "H1a", "H1b", "H2"]
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
            spark.sparkContext.setJobDescription(f"simhash {s} rep{rep}")
            t0 = time.perf_counter()
            df = build(spark, sf_dir, s)
            df.write.format("noop").mode("overwrite").save()
            times[s].append(time.perf_counter() - t0)
            if rep == 0:
                ep = df._jdf.queryExecution().executedPlan().toString()
                print(
                    f"{s}: ArrowEvalPython={ep.count('ArrowEvalPython')} "
                    f"Exchange={ep.count('Exchange')} "
                    f"Scan(existing RDD)={ep.count('Scan ExistingRDD')}",
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
