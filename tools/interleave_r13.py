"""Round-12 verdict ask #2: interleaved A/B of the eleven r12 bench risers.

Protocol (proven in BENCH_interleave_r11.json): on a quiet host, alternate a
Spark sample and a DuckDB sample of the SAME query inside one session window
so both engines see identical host conditions; min-of-reps; first sample of
a session carries one-time store/index builds and is excluded by min. The
risers' code and plans are unchanged since r11, so any real regression must
reproduce here; if the quiet-host min returns to the r11 row, the r12 local
row was contention.

Writes BENCH_interleave_r12risers.json at the repo root.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(ROOT))

RISERS = [
    "sequence_packing",        # driver row 3.39 s vs local 0.76 s
    "nation_pair_volume",      # 1.89x vs r11 local
    "bloom_decontamination",   # 1.86x
    "duplicate_spans",         # 1.73x
    "forecast_store_roundtrip",  # 1.67x
    "zarr_v3_store_roundtrip",   # 1.66x
    "ivf_knn",                 # 1.63x
    "dedup_components",        # 1.56x
    "store_lifecycle_diff",    # 1.54x
    "hindcast_store_roundtrip",  # 1.53x
    "streaming_hourly_stats",  # 1.52x
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("INTERLEAVE_REPS", "6"))
    load0 = os.getloadavg()[0]

    from pyspark.sql import SparkSession

    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["pricing_summary"].fn(spark, sf_dir).collect()  # JVM warmup

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out: dict[str, dict] = {}
    for name in RISERS:
        qd = REGISTRY[name]
        s_samples: list[float] = []
        d_samples: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            len(qd.fn(spark, sf_dir).collect())
            s_samples.append(round(time.perf_counter() - t0, 4))
            if qd.oracle:
                t0 = time.perf_counter()
                con.execute(qd.oracle).fetchall()
                d_samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "spark_min": min(s_samples),
            "spark_samples": s_samples,
            "duckdb_min": min(d_samples) if d_samples else None,
            "duckdb_samples": d_samples,
        }
        print(name, out[name]["spark_min"], out[name]["duckdb_min"], flush=True)

    doc = {
        "purpose": (
            "round-12 verdict ask #2: quiet-host interleaved A/B of the "
            "sequence_packing driver-row riser and the ten >1.5x common-set "
            "local risers; code/plans unchanged since r11, so a quiet-host "
            "min at the r11 row rules the r12 row contention"
        ),
        "host": f"load avg {load0:.2f} at start, 2026-08-16, sf0.1 local[32]",
        "method": (
            "per query: alternate one Spark sample and one DuckDB sample of "
            "the same query in one session window x %d reps; min-of-reps; "
            "first sample carries one-time store/index builds" % reps
        ),
        "queries": out,
    }
    (ROOT / "BENCH_interleave_r12risers.json").write_text(json.dumps(doc, indent=1))
    print("written")


if __name__ == "__main__":
    main()
