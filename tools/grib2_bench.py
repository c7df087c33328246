"""GRIB2 sharded sink/source scale curve: measure the distributed write
(sources/grib2.write_grib2_sharded), the full re-ingest through
read_binary_gridded + grib2_decoder, and a single-bucket glob read at
1x/10x/100x grid cells, and verify the design claims: write and full
read ~linear in cells, one-bucket read FLAT (the one-file-per-time-bucket
sharding IS the partition pruning — a month's read costs the same against
a 200-file archive as against 2, because the path glob never opens the
rest).

Usage: python tools/grib2_bench.py [base_days] [ny] [nx]
Prints one JSON line per scale plus a markdown table, and rewrites the
grib2-curve section of SCALE.md.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORK = Path("/tmp/grib2_bench")
MARK_BEGIN = "<!-- grib2-curve:begin (tools/grib2_bench.py owns this section) -->"
MARK_END = "<!-- grib2-curve:end -->"


def tall_df(spark, d0: dt.datetime, days: int, lats, lons, seed: int):
    import pandas as pd

    ny, nx = len(lats), len(lons)
    rng = np.random.RandomState(seed)
    times = np.datetime64(d0, "ns") + np.repeat(
        np.arange(days, dtype="int64"), ny * nx
    ).astype("timedelta64[D]").astype("timedelta64[ns]")
    pdf = pd.DataFrame(
        {
            "time": times,
            "latitude": np.tile(np.repeat(lats, nx), days),
            "longitude": np.tile(np.tile(lons, ny), days),
            "data": np.round(rng.uniform(0.0, 300.0, days * ny * nx), 2),
        }
    )
    return spark.createDataFrame(pdf)


def main() -> None:
    base_days = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    nx = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from pyspark.sql import SparkSession

    from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
    from zarr_climate_etl_ipfs_spark.sources.grib2 import (
        grib2_decoder,
        write_grib2_sharded,
    )
    from zarr_climate_etl_ipfs_spark.sources.ingest import read_binary_gridded

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("grib2_bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # GRIB section 3 wants a microdegree-regular grid: exact 1-degree steps
    lats = 50.0 - np.arange(ny, dtype="float64")
    lons = -130.0 + np.arange(nx, dtype="float64")
    d0 = dt.datetime(2000, 1, 1)
    desc = DatasetDescriptor(dataset_name="bench", data_var="data")

    def write(df, store):
        store.mkdir(parents=True, exist_ok=True)
        return write_grib2_sharded(
            df, str(store), var="data", time_dim="time",
            lat_dim="latitude", lon_dim="longitude",
            bucket_fmt="yyyy-MM", decimal_scale=2,
        )

    # warmup: write+read once so the 1x row isn't charged for cold-start
    warm = WORK / "warm"
    shutil.rmtree(warm, ignore_errors=True)
    write(tall_df(spark, d0, 15, lats, lons, 0), warm)
    read_binary_gridded(
        spark, str(warm / "*.grib2"), desc, decoder=grib2_decoder(desc)
    ).count()
    shutil.rmtree(warm, ignore_errors=True)

    results = []
    for mult in (1, 10, 100):
        days = base_days * mult
        cells = days * ny * nx
        store = WORK / f"{mult}x"
        shutil.rmtree(store, ignore_errors=True)
        # materialize the synthetic input once (localCheckpoint): the Arrow
        # local relation otherwise re-converts driver-side on EVERY action,
        # and does so on different code paths at different sizes (measured:
        # 960k rows/32 parts = 3.8 s per action vs 9.6M rows/960 parts =
        # 1.4 s) — the curve must measure the sink, not createDataFrame
        df = (
            tall_df(spark, d0, days, lats, lons, mult)
            .repartition(32)
            .localCheckpoint(eager=True)
        )

        t0 = time.perf_counter()
        man = write(df, store)
        t_write = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_full = read_binary_gridded(
            spark, str(store / "*.grib2"), desc, decoder=grib2_decoder(desc)
        ).count()
        t_full = time.perf_counter() - t0

        # one-bucket read: a fixed month out of the middle — the per-bucket
        # file sharding must keep this flat as the archive grows
        mid = d0 + dt.timedelta(days=days // 2)
        t0 = time.perf_counter()
        n_slice = read_binary_gridded(
            spark,
            str(store / f"{mid:%Y-%m}.grib2"),
            desc,
            decoder=grib2_decoder(desc),
        ).count()
        t_slice = time.perf_counter() - t0

        rec = {
            "scale": f"{mult}x",
            "cells": cells,
            "files": man["files"],
            "bytes": man["bytes"],
            "rows_ok": n_full == cells and n_slice % (ny * nx) == 0 and n_slice > 0,
            "write_s": round(t_write, 2),
            "full_read_s": round(t_full, 2),
            "one_bucket_read_s": round(t_slice, 2),
        }
        results.append(rec)
        print(json.dumps(rec))
        shutil.rmtree(store, ignore_errors=True)

    table = [
        "| scale | cells | files | grib bytes | distributed write "
        "| full re-ingest | one-bucket read |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        table.append(
            f"| {r['scale']} | {r['cells']:,} | {r['files']} | {r['bytes']:,} "
            f"| {r['write_s']} s | {r['full_read_s']} s "
            f"| {r['one_bucket_read_s']} s |"
        )
    print("\n" + "\n".join(table))

    section = [
        MARK_BEGIN,
        "",
        "## GRIB2 sharded sink/source (1x -> 10x -> 100x grid cells)",
        "",
        "The distribution format the reference's ETLs consume, measured end",
        "to end (40x40 grid, daily steps, one file per month, simple packing",
        "at decimal_scale=2). Write = one shuffle on the bucket +",
        "executor-side from-spec encode; full read = binaryFile scan +",
        "flatMap decode (the per-file parallel unit of any GRIB archive);",
        "one-bucket read = a fixed month by path glob, which must stay FLAT",
        "as the archive grows — the file-per-bucket sharding IS the",
        "partition pruning. Warm session, local[32]. Reproduce:",
        "`python tools/grib2_bench.py`.",
        "",
        *table,
        "",
        "Measured this run: write grows"
        f" {results[-1]['write_s'] / max(results[0]['write_s'], 0.01):.1f}x and the full"
        f" re-ingest {results[-1]['full_read_s'] / max(results[0]['full_read_s'], 0.01):.1f}x"
        f" for {results[-1]['cells'] // max(results[0]['cells'], 1)}x cells, while the"
        " one-bucket read moves"
        f" {results[-1]['one_bucket_read_s'] / max(results[0]['one_bucket_read_s'], 0.01):.1f}x"
        " across the same spread.",
        MARK_END,
    ]
    md = Path(__file__).resolve().parent.parent / "SCALE.md"
    if md.exists():
        text = md.read_text()
        if MARK_BEGIN in text:
            head, rest = text.split(MARK_BEGIN, 1)
            _, tail = rest.split(MARK_END, 1)
            text = head + "\n".join(section) + tail
        else:
            text = text.rstrip() + "\n\n" + "\n".join(section) + "\n"
        md.write_text(text)
        print(f"updated {md}")
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
