"""Benchmark harness: run the query catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from pyspark.sql import SparkSession

    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus) if cpus.isdigit() else 32)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/scan path once so per-query numbers measure the queries,
    # not session startup
    REGISTRY["pricing_summary"].fn(spark, sf_dir).collect()

    # Headline subset by default (one per workload family, weighted toward
    # the heavy ones); BENCH_ALL=1 runs the whole catalog.
    HEADLINE = [
        "pricing_summary",
        "dim_broadcast_join",
        "local_supplier_volume",
        "update_key_split",
        "asof_join",
        "gaps_islands",
        "sessionize",
        "topk_revenue",
        "rolling_revenue",
        "climatology_anomaly",
        "token_stats",
        "language_id",
        "dedup_exact",
        "minhash_signatures",
        "minhash_lsh_neardups",
        "ngram_jaccard_pairs",
        "knn_brute_force",
        "embedding_neardup_pairs",
    ]
    selected = (
        REGISTRY
        if os.environ.get("BENCH_ALL")
        else {k: REGISTRY[k] for k in HEADLINE if k in REGISTRY}
    )
    # min-of-N per query: the host shows multi-second contention spikes that
    # would otherwise dominate single-shot numbers
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name, qd in selected.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            len(qd.fn(spark, sf_dir).collect())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "query_catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
