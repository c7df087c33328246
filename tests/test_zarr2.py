"""Zarr v2 store reader/writer (sources/zarr2.py) — the reference's native
format (utils/publish.py write_initial_zarr / utils/store.py mappers),
implemented from the public Zarr v2 spec with stdlib + numpy."""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.sources import encryption
from zarr_climate_etl_ipfs_spark.sources import zarr2 as z


# ---------------------------------------------------------------------------
# local (driver-side) round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "dtype",
    ["<f4", "<f8", "<i2", "<i4", "<i8", ">f8", ">i4", "|b1", "<M8[ns]"],
)
def test_local_roundtrip_dtypes(tmp_path, dtype):
    store = str(tmp_path / "s")
    dt = np.dtype(dtype)
    if dt.kind == "M":
        arr = np.arange(30, dtype="<i8").reshape(5, 6).astype("<M8[D]").astype(dt)
    elif dt.kind == "b":
        arr = (np.arange(30).reshape(5, 6) % 3 == 0)
    else:
        arr = np.arange(30, dtype=dt).reshape(5, 6)
    z.write_zarr_array_local(store, "v", arr, chunks=(2, 4))
    back = z.read_zarr_array_local(store, "v")
    assert back.dtype == dt
    assert (back == arr).all()


@pytest.mark.parametrize(
    "compressor",
    [
        None,
        {"id": "zlib", "level": 6},
        {"id": "gzip", "level": 1},
        {"id": "bz2", "level": 9},
        {"id": "lzma"},
    ],
)
def test_local_roundtrip_compressors(tmp_path, compressor):
    store = str(tmp_path / "s")
    arr = np.linspace(0, 1, 97, dtype="<f8")  # prime length → edge chunk
    z.write_zarr_array_local(store, "v", arr, chunks=(16,), compressor=compressor)
    zarray = json.loads((tmp_path / "s" / "v" / ".zarray").read_text())
    assert zarray["compressor"] == compressor
    assert (z.read_zarr_array_local(store, "v") == arr).all()


@pytest.mark.parametrize("order", ["C", "F"])
@pytest.mark.parametrize("separator", [".", "/"])
def test_local_order_and_separator(tmp_path, order, separator):
    store = str(tmp_path / "s")
    arr = np.arange(24, dtype="<i4").reshape(4, 6)
    z.write_zarr_array_local(
        store, "v", arr, chunks=(3, 4), order=order, separator=separator
    )
    key0 = "0.0" if separator == "." else os.path.join("0", "0")
    assert (tmp_path / "s" / "v" / key0).exists()
    assert (z.read_zarr_array_local(store, "v") == arr).all()


def test_missing_chunk_reads_as_fill(tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(16, dtype="<f4").reshape(4, 4)
    z.write_zarr_array_local(store, "v", arr, chunks=(2, 2), fill_value=np.nan)
    os.remove(tmp_path / "s" / "v" / "1.1")
    back = z.read_zarr_array_local(store, "v")
    assert np.isnan(back[2:, 2:]).all()
    assert (back[:2] == arr[:2]).all()


def test_fill_value_json_specials():
    dt = np.dtype("<f8")
    assert np.isnan(z.parse_fill("NaN", dt))
    assert z.parse_fill("Infinity", dt) == np.inf
    assert z.parse_fill("-Infinity", dt) == -np.inf
    assert z.encode_fill(np.float64("nan"), dt) == "NaN"
    assert z.encode_fill(np.float64("-inf"), dt) == "-Infinity"
    assert z.parse_fill(None, dt) is None


def test_delta_filter_roundtrip(tmp_path):
    store = str(tmp_path / "s")
    arr = np.cumsum(np.random.default_rng(7).integers(0, 9, 200)).astype("<i8")
    z.write_zarr_array_local(
        store, "v", arr, chunks=(64,), filters=[{"id": "delta", "dtype": "<i8"}]
    )
    assert (z.read_zarr_array_local(store, "v") == arr).all()


def test_fixedscaleoffset_filter_roundtrip(tmp_path):
    store = str(tmp_path / "s")
    # values exactly representable at scale=100 → decode is exact
    arr = (np.arange(50, dtype="<f8") * 7 % 90) / 100.0 + 1000.0
    filt = {
        "id": "fixedscaleoffset",
        "offset": 1000.0,
        "scale": 100.0,
        "dtype": "<f8",
        "astype": "<i2",
    }
    z.write_zarr_array_local(store, "v", arr, chunks=(32,), filters=[filt])
    back = z.read_zarr_array_local(store, "v")
    assert np.allclose(back, arr, atol=1e-12)


@pytest.mark.parametrize(
    "compressor",
    [
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2},
        {"id": "blosc", "cname": "zlib", "clevel": 5, "shuffle": 0},
        {"id": "blosc", "cname": "blosclz", "clevel": 5, "shuffle": 1},
        {"id": "lz4"},
        {"id": "zstd", "level": 3},
    ],
)
def test_blosc_family_compressors_roundtrip(tmp_path, compressor):
    """The zarr v2 DEFAULT compressor family (numcodecs Blosc/LZ4/Zstd)
    round-trips through the store writer/reader — no compiled wheels."""
    store = str(tmp_path / "s")
    arr = np.arange(1000, dtype="<f8").reshape(50, 20)
    z.write_zarr_array_local(store, "v", arr, chunks=(16, 16), compressor=compressor)
    back = z.read_zarr_array_local(store, "v")
    assert (back == arr).all()


def test_blosclz_container_stream_decodes():
    """A hand-built blosc container whose inner stream is blosclz (format
    code 0): 4 output bytes from a 3-byte blosclz stream (literal 'a' +
    RLE match of 3 at distance 1) — the last inner-codec seam, closed."""
    import struct

    stream = bytes([0x00, ord("a"), 0x40, 0x00])  # 'a' + copy 4 @ d=1
    # stream (4 B) < neblock (5 B), so the container must route it through
    # the blosclz decoder, not the stored-raw path; bstart points at the
    # stream's size prefix (byte 20: 16-byte header + one bstart)
    frame = struct.pack(
        "<BBBBIII", 2, 1, 0x10, 1, 5, 5, 16 + 4 + 4 + len(stream)
    )  # flags: dont-split, fmt 0 (blosclz)
    frame += struct.pack("<I", 20) + struct.pack("<I", len(stream)) + stream
    meta = z.ArrayMeta("v", (5,), (5,), "|u1", compressor={"id": "blosc"})
    assert bytes(z.decode_chunk(frame, meta)) == b"aaaaa"


def test_malformed_blosc_frame_raises():
    meta = z.ArrayMeta("v", (1,), (1,), "<f4", compressor={"id": "blosc"})
    with pytest.raises(z.ZarrError, match="blosc"):
        z.decode_chunk(b"\x00\x00\x00\x00", meta)


def test_unknown_codec_and_filter_raise():
    with pytest.raises(z.ZarrError, match="unknown compressor"):
        z.decode_chunk(b"", z.ArrayMeta("v", (1,), (1,), "<f4", compressor={"id": "nope"}))
    with pytest.raises(z.ZarrError, match="unknown filter"):
        z.encode_chunk(
            np.zeros(1, "<f4"),
            z.ArrayMeta("v", (1,), (1,), "<f4", filters=[{"id": "nope"}]),
        )


def test_encrypted_chunks_roundtrip_reference_config(tmp_path):
    """The reference's EncryptionFilter config (encryption.py:96-99:
    codec_id 'xchacha20poly1305', key looked up by SHA3-256 hash) decodes
    through our parity codec — an encrypted published store is readable."""
    key = bytes(range(32))
    kh = encryption.register_key(key)
    store = str(tmp_path / "s")
    arr = np.arange(40, dtype="<f8")
    filt = {"id": "xchacha20poly1305", "key_hash": kh}
    z.write_zarr_array_local(
        store, "v", arr, chunks=(16,), compressor=None, filters=[filt]
    )
    raw = (tmp_path / "s" / "v" / "0").read_bytes()
    assert raw[:24] != arr[:3].tobytes()  # ciphertext, not plaintext
    assert (z.read_zarr_array_local(store, "v") == arr).all()
    # chunks decrypt one-off through the reference blob layout too
    meta = z.open_group(store)["v"]
    plain = encryption.xdecrypt_bytes(raw, key)
    assert np.frombuffer(plain, "<f8")[0] == 0.0
    assert meta.filters == [filt]


def test_encrypted_chunk_missing_key_raises(tmp_path):
    store = str(tmp_path / "s")
    key = os.urandom(32)
    kh = encryption.register_key(key)
    z.write_zarr_array_local(
        store,
        "v",
        np.zeros(4, "<f4"),
        filters=[{"id": "xchacha20poly1305", "key_hash": kh}],
    )
    # simulate a fresh process with an empty registry entry for this hash
    meta = z.open_group(store)["v"]
    meta.filters = [{"id": "xchacha20poly1305", "key_hash": "0" * 64}]
    with open(tmp_path / "s" / "v" / "0", "rb") as f:
        with pytest.raises(encryption.EncryptionError):
            z.decode_chunk(f.read(), meta)


def test_consolidated_metadata_fast_path_and_fallback(tmp_path):
    store = str(tmp_path / "s")
    z.write_zarr_array_local(store, "a", np.arange(4, dtype="<i4"))
    z.write_zarr_array_local(store, "b", np.arange(6, dtype="<f8"))
    z.consolidate_metadata(store)
    metas = z.open_group(store)
    assert set(metas) == {"a", "b"}
    # corrupt consolidation → the walk fallback still finds the arrays
    (tmp_path / "s" / ".zmetadata").write_text("{not json")
    assert set(z.open_group(store)) == {"a", "b"}
    # no arrays at all → explicit error
    with pytest.raises(z.ZarrError, match="no Zarr v2 or v3 arrays"):
        z.open_group(str(tmp_path / "empty"))


# ---------------------------------------------------------------------------
# distributed read
# ---------------------------------------------------------------------------


def _grid_store(tmp_path, fill=-999.0):
    store = str(tmp_path / "grid")
    times = np.array(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"],
        dtype="M8[ns]",
    )
    lats = np.array([10.0, 20.0, 30.0])
    vals = np.arange(15, dtype="<f8").reshape(5, 3)
    vals[1, 1] = fill
    z.write_zarr_array_local(store, "time", times, attrs={z.DIM_ATTR: ["time"]})
    z.write_zarr_array_local(store, "lat", lats, attrs={z.DIM_ATTR: ["lat"]})
    z.write_zarr_array_local(
        store,
        "pr",
        vals,
        chunks=(2, 2),
        compressor={"id": "zlib", "level": 1},
        attrs={z.DIM_ATTR: ["time", "lat"]},
        fill_value=fill,
    )
    z.consolidate_metadata(store)
    return store, times, lats, vals


def test_read_tall_values_and_coords(spark, tmp_path):
    store, times, lats, vals = _grid_store(tmp_path)
    df = z.read_zarr_tall(spark, store)  # var auto-detected: pr
    assert df.columns == ["time", "lat", "pr"]
    rows = {(r["time"], r["lat"]): r["pr"] for r in df.collect()}
    assert len(rows) == 15
    for i, t in enumerate(pd.DatetimeIndex(times)):
        for j, la in enumerate(lats):
            assert rows[(t.to_pydatetime(), la)] == vals[i, j]


def test_read_tall_mask_and_skip_fill(spark, tmp_path):
    store, *_ = _grid_store(tmp_path)
    masked = z.read_zarr_tall(spark, store, mask_fill=True)
    assert masked.filter(F.col("pr").isNull()).count() == 1
    skipped = z.read_zarr_tall(spark, store, skip_fill=True)
    assert skipped.count() == 14
    assert skipped.filter(F.col("pr") == -999.0).count() == 0


def test_read_tall_absent_chunk_is_fill_block(spark, tmp_path):
    store, *_ = _grid_store(tmp_path)
    os.remove(os.path.join(store, "pr", "1.0"))  # disjoint from the fill cell
    df = z.read_zarr_tall(spark, store, mask_fill=True)
    assert df.count() == 15  # absent chunk emitted as fill → NULL
    assert df.filter(F.col("pr").isNull()).count() == 5  # 2x2 block + masked cell
    assert z.read_zarr_tall(spark, store, skip_fill=True).count() == 10


def test_read_tall_bounds_prune_and_filter(spark, tmp_path):
    store, times, lats, vals = _grid_store(tmp_path)
    df = z.read_zarr_tall(
        spark, store, bounds={"time": ("2024-01-02", "2024-01-03")}, skip_fill=True
    )
    rows = df.collect()
    dates = {str(r["time"].date()) for r in rows}
    assert dates == {"2024-01-02", "2024-01-03"}
    assert len(rows) == 5  # 2 days × 3 lats − 1 fill cell
    # boundary inclusivity on both ends
    lo = z.read_zarr_tall(spark, store, bounds={"time": ("2024-01-01", "2024-01-01")})
    assert lo.count() == 3
    # out-of-range bounds prune every chunk
    none = z.read_zarr_tall(spark, store, bounds={"time": ("2030-01-01", "2030-12-31")})
    assert none.count() == 0


def test_read_tall_positional_axis_when_no_coord_array(spark, tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(6, dtype="<i8").reshape(2, 3)
    z.write_zarr_array_local(store, "v", arr, attrs={z.DIM_ATTR: ["row", "col"]})
    df = z.read_zarr_tall(spark, store, var="v")
    got = {(r["row"], r["col"]): r["v"] for r in df.collect()}
    assert got[(0, 0)] == 0 and got[(1, 2)] == 5


def test_read_tall_ambiguous_var_raises(spark, tmp_path):
    store = str(tmp_path / "s")
    z.write_zarr_array_local(store, "a", np.zeros((2, 2), "<f4"), attrs={z.DIM_ATTR: ["x", "y"]})
    z.write_zarr_array_local(store, "b", np.zeros((2, 2), "<f4"), attrs={z.DIM_ATTR: ["x", "y"]})
    with pytest.raises(z.ZarrError, match="ambiguous"):
        z.read_zarr_tall(spark, store)


# ---------------------------------------------------------------------------
# distributed write
# ---------------------------------------------------------------------------


def _tall_df(spark):
    pdf = pd.DataFrame(
        {
            "t": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00"] * 3),
            "y": [0, 1, 2, 0, 1, 2],
            "x": [5, 5, 5, 7, 7, 7],
            "cents": np.array([10, 20, 30, 40, 50, 60], dtype="int64"),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_write_tall_roundtrip(spark, tmp_path):
    sdf, pdf = _tall_df(spark)
    store = str(tmp_path / "w")
    summary = z.write_zarr_tall(
        sdf, store, "cents", ["t", "y", "x"], (1, 2, 2), fill_value=-1
    )
    assert summary["cells"] == 6 and summary["shape"] == [2, 3, 2]
    # store is spec-valid: consolidated, dims attr, coord arrays
    metas = z.open_group(store)
    assert set(metas) == {"cents", "t", "y", "x"}
    assert metas["cents"].dims == ["t", "y", "x"]
    assert (z.read_zarr_array_local(store, "x") == np.array([5, 7])).all()
    back = z.read_zarr_tall(spark, store, "cents", skip_fill=True)
    got = sorted((r["t"], r["y"], r["x"], r["cents"]) for r in back.collect())
    want = sorted(
        (t.to_pydatetime(), int(y), int(x), int(c))
        for t, y, x, c in zip(pdf["t"], pdf["y"], pdf["x"], pdf["cents"])
    )
    assert got == want


def test_write_tall_duplicate_cells_raise(spark, tmp_path):
    sdf, pdf = _tall_df(spark)
    dup = sdf.unionAll(sdf.limit(1))
    store = str(tmp_path / "w")
    with pytest.raises(Exception, match="duplicate cells"):
        z.write_zarr_tall(dup, store, "cents", ["t", "y", "x"], (1, 2, 2))
    # on_duplicates="any" keeps one arbitrary winner
    shutil.rmtree(store, ignore_errors=True)
    z.write_zarr_tall(
        dup, store, "cents", ["t", "y", "x"], (1, 2, 2), on_duplicates="any"
    )
    assert z.read_zarr_tall(spark, store, "cents", skip_fill=True).count() == 6


def test_write_tall_empty_input(spark, tmp_path):
    sdf, _ = _tall_df(spark)
    store = str(tmp_path / "w")
    summary = z.write_zarr_tall(
        sdf.filter(F.lit(False)), store, "cents", ["t", "y", "x"], (1, 2, 2)
    )
    assert summary == {"n_chunks": 0, "bytes": 0, "cells": 0, "shape": [0, 0, 0]}
    assert z.read_zarr_tall(spark, store, "cents").count() == 0


def test_write_tall_routing_loss_raises(spark, tmp_path):
    """A row whose dim value misses the coordinate-axis pass (here: a NULL
    y) would be silently dropped by the coord-index inner joins; the
    observation-backed guard must fail loudly instead — and leave no
    partial store behind."""
    sdf, pdf = _tall_df(spark)
    bad = sdf.unionByName(
        spark.createDataFrame(
            [(pd.Timestamp("2024-01-01 00:00").to_pydatetime(), None, 5, 99)],
            schema=sdf.schema,
        )
    )
    store = str(tmp_path / "w")
    with pytest.raises(z.ZarrError, match="routing loss"):
        z.write_zarr_tall(bad, store, "cents", ["t", "y", "x"], (1, 2, 2))
    assert not os.path.exists(store)


def test_write_tall_overwrite_guard(spark, tmp_path):
    sdf, _ = _tall_df(spark)
    store = str(tmp_path / "w")
    z.write_zarr_tall(sdf, store, "cents", ["t", "y", "x"], (1, 2, 2))
    with pytest.raises(z.ZarrError, match="overwrite"):
        z.write_zarr_tall(sdf, store, "cents", ["t", "y", "x"], (1, 2, 2))
    z.write_zarr_tall(sdf, store, "cents", ["t", "y", "x"], (2, 3, 2), overwrite=True)
    assert z.open_group(store)["cents"].chunks == (2, 3, 2)


def test_write_tall_float_with_filters(spark, tmp_path):
    pdf = pd.DataFrame({"k": np.arange(10, dtype="int64"), "v": np.arange(10) / 4.0})
    sdf = spark.createDataFrame(pdf)
    store = str(tmp_path / "w")
    z.write_zarr_tall(
        sdf,
        store,
        "v",
        ["k"],
        (4,),
        fill_value=np.nan,
        compressor={"id": "bz2", "level": 1},
    )
    back = z.read_zarr_tall(spark, store, "v")
    got = {r["k"]: r["v"] for r in back.collect()}
    assert got == {int(k): float(v) for k, v in zip(pdf["k"], pdf["v"])}


# ---------------------------------------------------------------------------
# Zarr v3 read dialect (zarr.json metadata, codec pipelines, c/-style keys)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "codecs",
    [
        None,  # bare little-endian bytes codec
        [{"name": "bytes", "configuration": {"endian": "little"}},
         {"name": "gzip", "configuration": {"level": 5}}],
        [{"name": "bytes", "configuration": {"endian": "little"}},
         {"name": "gzip", "configuration": {"level": 1}},
         {"name": "crc32c"}],
        [{"name": "transpose", "configuration": {"order": [1, 0]}},
         {"name": "bytes", "configuration": {"endian": "big"}}],
    ],
)
def test_v3_local_roundtrip_codecs(tmp_path, codecs):
    store = str(tmp_path / "s")
    arr = np.arange(5 * 7, dtype="<f8").reshape(5, 7)
    z.write_zarr3_array_local(store, "v", arr, chunks=(2, 3), codecs=codecs)
    meta = z.open_group(store)["v"]
    assert meta.zarr_format == 3
    assert (z.read_zarr_array_local(store, "v") == arr).all()


def test_v3_crc32c_known_vector_and_corruption(tmp_path):
    # the published CRC-32C check value (RFC 3720 appendix): '123456789'
    assert z._crc32c(b"123456789") == 0xE3069283
    store = str(tmp_path / "s")
    arr = np.arange(8, dtype="<i8")
    z.write_zarr3_array_local(
        store, "v", arr, chunks=(4,),
        codecs=[{"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "crc32c"}],
    )
    p = tmp_path / "s" / "v" / "c" / "1"
    raw = bytearray(p.read_bytes())
    raw[0] ^= 0xFF
    p.write_bytes(bytes(raw))
    with pytest.raises(z.ZarrError, match="crc32c"):
        z.read_zarr_array_local(store, "v")


def test_v3_key_encodings_and_missing_chunk(tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(6, dtype="<i4").reshape(2, 3)
    z.write_zarr3_array_local(
        store, "v", arr, chunks=(1, 2), fill_value=-1,
        chunk_key_encoding={"name": "v2", "configuration": {"separator": "."}},
    )
    assert (tmp_path / "s" / "v" / "0.0").exists()
    os.remove(tmp_path / "s" / "v" / "1.1")
    back = z.read_zarr_array_local(store, "v")
    assert back[1, 2] == -1 and (back[0] == arr[0]).all()


def test_v3_codec_errors_and_unknown_names():
    doc = {
        "node_type": "array", "shape": [1], "data_type": "float32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [1]}},
        "codecs": [{"name": "bytes"}, {"name": "zstd"}], "fill_value": 0,
    }
    meta = z._meta_from_v3_json("x", doc)
    with pytest.raises(z.ZarrError, match="zstd frame"):
        z.decode_chunk(b"0000", meta)  # not a zstd frame: named error
    doc["codecs"] = [{"name": "bytes"}, {"name": "nonsense"}]
    with pytest.raises(z.ZarrError, match="unknown v3 codec"):
        z.decode_chunk(b"0000", z._meta_from_v3_json("x", doc))


@pytest.mark.parametrize(
    "codec",
    [
        {"name": "zstd", "configuration": {"level": 3, "checksum": False}},
        {
            "name": "blosc",
            "configuration": {
                "cname": "zstd", "clevel": 3, "shuffle": "shuffle",
                "typesize": 4, "blocksize": 0,
            },
        },
        {
            "name": "blosc",
            "configuration": {"cname": "lz4", "clevel": 5, "shuffle": "bitshuffle"},
        },
    ],
)
def test_v3_blosc_zstd_codecs_roundtrip(codec):
    """v3 ``zstd`` and ``blosc`` codecs (the zarr-python v3 defaults)
    encode/decode through the v3 pipeline."""
    doc = {
        "node_type": "array", "shape": [40], "data_type": "float32",
        "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [40]}},
        "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, codec],
        "fill_value": 0,
    }
    meta = z._meta_from_v3_json("x", doc)
    arr = np.linspace(-5, 5, 40, dtype="<f4")
    assert (z.decode_chunk(z.encode_chunk(arr, meta), meta) == arr).all()


def test_v3_read_tall_distributed(spark, tmp_path):
    """A v3 group (coords + data array with dimension_names) opens through
    the same distributed reader as v2 — format detection per store."""
    store = str(tmp_path / "s3")
    times = np.array(["2024-03-01", "2024-03-02", "2024-03-03"], dtype="M8[ns]")
    lats = np.array([1.5, 2.5], dtype="<f8")
    vals = np.arange(6, dtype="<f8").reshape(3, 2)
    # time coords stay v2 (datetime is a v2 dtype; v3 datetimes are an
    # extension) — but data + lat are genuine v3 nodes
    z.write_zarr_array_local(store, "time", times, attrs={z.DIM_ATTR: ["time"]})
    z.write_zarr3_array_local(store, "lat", lats, dimension_names=["lat"])
    z.write_zarr3_array_local(
        store, "pr", vals, chunks=(2, 2), dimension_names=["time", "lat"],
        codecs=[{"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "gzip", "configuration": {"level": 1}}],
        fill_value=float("nan"),
    )
    # mixed-format store: open_group merges both dialects (v3 wins name
    # conflicts), so the v2 datetime coord resolves alongside the v3 data
    assert {n: m.zarr_format for n, m in z.open_group(store).items()} == {
        "time": 2, "lat": 3, "pr": 3,
    }
    df = z.read_zarr_tall(spark, store, var="pr")
    got = {(r["time"], r["lat"]): r["pr"] for r in df.collect()}
    assert len(got) == 6
    assert got[(pd.Timestamp(times[2]).to_pydatetime(), 2.5)] == 5.0


def test_v3_pure_group_walk_and_consolidated(tmp_path):
    store = str(tmp_path / "s3")
    z.write_zarr3_array_local(store, "a", np.arange(4, dtype="<i8"))
    z.write_zarr3_array_local(store, "b", np.arange(3, dtype="<f4"))
    metas = z.open_group(store)  # group zarr.json → walk
    assert set(metas) == {"a", "b"} and all(m.zarr_format == 3 for m in metas.values())
    # inline consolidated metadata fast path
    import json as _json

    root = tmp_path / "s3" / "zarr.json"
    a_doc = _json.loads((tmp_path / "s3" / "a" / "zarr.json").read_text())
    doc = _json.loads(root.read_text())
    doc["consolidated_metadata"] = {"kind": "inline", "metadata": {"a": a_doc}}
    root.write_text(_json.dumps(doc))
    assert set(z.open_group(store)) == {"a"}


def _shard_conf(**over):
    conf = {
        "chunk_shape": [2, 3],
        "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
                   {"name": "gzip", "configuration": {"level": 1}}],
        "index_codecs": [{"name": "bytes"}, {"name": "crc32c"}],
        "index_location": "end",
    }
    conf.update(over)
    return conf


def test_v3_sharding_roundtrip_and_missing_inner(tmp_path):
    """sharding_indexed: a stored chunk is a shard of encoded inner chunks
    plus a crc-guarded (offset, nbytes) index; 2^64-1 entries mark absent
    inner chunks, which must read as fill."""
    store = str(tmp_path / "s")
    arr = np.arange(10 * 9, dtype="<f8").reshape(10, 9)
    z.write_zarr3_array_local(
        store, "v", arr, chunks=(4, 6), fill_value=float("nan"),
        codecs=[{"name": "sharding_indexed", "configuration": _shard_conf()}],
    )
    assert (z.read_zarr_array_local(store, "v") == arr).all()
    # mark inner chunk (1,1) of shard c/0/0 absent, recompute the index crc
    p = tmp_path / "s" / "v" / "c" / "0" / "0"
    buf = bytearray(p.read_bytes())
    idx_size = 4 * 16 + 4
    idx = np.frombuffer(bytes(buf[-idx_size:-4]), dtype="<u8").reshape(2, 2, 2).copy()
    idx[1, 1] = (z._SHARD_MISSING, z._SHARD_MISSING)
    raw = idx.tobytes()
    buf[-idx_size:] = raw + z._crc32c(raw).to_bytes(4, "little")
    p.write_bytes(bytes(buf))
    back = z.read_zarr_array_local(store, "v")
    assert np.isnan(back[2:4, 3:6]).all()
    assert (back[0:2] == arr[0:2]).all()


def test_v3_sharding_index_corruption_detected(tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(8, dtype="<i8").reshape(4, 2)
    z.write_zarr3_array_local(
        store, "v", arr, chunks=(4, 2),
        codecs=[{"name": "sharding_indexed",
                 "configuration": _shard_conf(chunk_shape=[2, 2])}],
    )
    p = tmp_path / "s" / "v" / "c" / "0" / "0"
    buf = bytearray(p.read_bytes())
    buf[-1] ^= 0xFF  # flip a bit in the index crc
    p.write_bytes(bytes(buf))
    with pytest.raises(z.ZarrError, match="shard index crc32c"):
        z.read_zarr_array_local(store, "v")


def test_v3_sharding_index_at_start(tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(24, dtype="<i4").reshape(4, 6)
    z.write_zarr3_array_local(
        store, "v", arr, chunks=(4, 6),
        codecs=[{"name": "sharding_indexed",
                 "configuration": _shard_conf(index_location="start",
                                              index_codecs=[{"name": "bytes"}])}],
    )
    assert (z.read_zarr_array_local(store, "v") == arr).all()


def test_v3_sharding_distributed_read(spark, tmp_path):
    store = str(tmp_path / "s")
    arr = np.arange(12 * 4, dtype="<f8").reshape(12, 4)
    z.write_zarr3_array_local(
        store, "step", np.arange(12, dtype="<i8"), dimension_names=["step"]
    )
    z.write_zarr3_array_local(
        store, "v", arr, chunks=(4, 4), dimension_names=["step", "k"],
        codecs=[{"name": "sharding_indexed",
                 "configuration": _shard_conf(chunk_shape=[2, 2])}],
    )
    df = z.read_zarr_tall(spark, store, var="v", bounds={"step": (5, 9)})
    rows = df.collect()
    assert len(rows) == 5 * 4
    got = {(r["step"], r["k"]): r["v"] for r in rows}
    assert got[(5, 0)] == arr[5, 0] and got[(9, 3)] == arr[9, 3]


# ---------------------------------------------------------------------------
# kerchunk refs — the reference pipeline's virtual-zarr artifact
# ---------------------------------------------------------------------------

_CHIRPS_REFS = "/root/reference/tests/unit/inputs/chirps_example_zarr.json"


@pytest.mark.skipif(not os.path.exists(_CHIRPS_REFS), reason="reference fixture absent")
def test_reference_chirps_refs_golden(spark, tmp_path):
    """Golden parity test on the reference's OWN unit fixture: the CHIRPS
    kerchunk refs JSON (tests/unit/inputs/chirps_example_zarr.json, the
    artifact create_zarr_json produces) materializes into a store this
    engine opens, with CF time decode and sentinel masking producing the
    canonical tall frame."""
    import base64

    import datetime as dt

    from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
    from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize

    store = z.materialize_kerchunk_refs(_CHIRPS_REFS, str(tmp_path / "chirps"))
    metas = z.open_group(store)
    assert set(metas) == {"latitude", "longitude", "precip", "time"}
    assert metas["precip"].dims == ["time", "latitude", "longitude"]
    assert metas["precip"].fill_value == -9999.0

    lat = z.read_zarr_array_local(store, "latitude")
    assert lat.tolist() == [14.125, 14.375, 14.625, 14.875, 15.125, 15.375, 15.625, 15.875]

    # independent expectation straight from the refs JSON bytes
    refs = json.loads(open(_CHIRPS_REFS).read())["refs"]
    raw_pr = np.frombuffer(base64.b64decode(refs["precip/0.0.0"][7:]), "<f4")
    raw_t = np.frombuffer(base64.b64decode(refs["time/0"][7:]), "<f4")[0]

    df = z.read_zarr_tall(spark, store, var="precip")
    assert df.count() == 64
    desc = DatasetDescriptor(
        dataset_name="chirps_refs",
        data_var="precip",
        time_resolution="daily",
        dataset_start_date=dt.datetime(1980, 1, 1),
        allow_overwrite=True,
        missing_value=-9999.0,
    )
    canon = canonicalize(df, desc, cf_epoch="1980-01-01")
    rows = canon.collect()
    assert len(rows) == 64
    n_null = sum(1 for r in rows if r["precip"] is None)
    assert n_null == int((raw_pr == -9999.0).sum()) > 0
    expect_day = dt.datetime(1980, 1, 1) + dt.timedelta(days=float(raw_t))
    assert {r["time"] for r in rows} == {expect_day}
    vals = sorted(r["precip"] for r in rows if r["precip"] is not None)
    expect_vals = sorted(float(v) for v in raw_pr if v != -9999.0)
    assert vals == expect_vals


def test_kerchunk_local_ranges_and_seams(tmp_path):
    data_file = tmp_path / "blob.bin"
    payload = np.arange(6, dtype="<f8")
    data_file.write_bytes(b"JUNKJUNK" + payload.tobytes() + b"TAIL")
    refs = {
        "version": 1,
        "refs": {
            ".zgroup": '{"zarr_format":2}',
            "v/.zarray": json.dumps({
                "chunks": [6], "compressor": None, "dtype": "<f8",
                "fill_value": None, "filters": None, "order": "C",
                "shape": [6], "zarr_format": 2,
            }),
            "v/.zattrs": '{"_ARRAY_DIMENSIONS":["v"]}',
            "v/0": ["blob.bin", 8, 48],
        },
    }
    store = z.materialize_kerchunk_refs(refs, str(tmp_path / "s"), base_dir=str(tmp_path))
    assert (z.read_zarr_array_local(store, "v") == payload).all()
    # remote byte-range → named seam
    refs["refs"]["v/0"] = ["s3://bucket/blob.bin", 8, 48]
    with pytest.raises(z.ZarrError, match="fsspec"):
        z.materialize_kerchunk_refs(refs, str(tmp_path / "s2"))
    # file:// scheme resolves locally
    refs["refs"]["v/0"] = [f"file://{data_file}", 8, 48]
    store = z.materialize_kerchunk_refs(refs, str(tmp_path / "s3"))
    assert (z.read_zarr_array_local(store, "v") == payload).all()
    # remote byte-ranges resolve through an injected opener (the fsspec
    # seam as dependency injection — the caller brings the network stack)
    import io

    served: list[str] = []

    def fake_opener(url: str):
        served.append(url)
        return io.BytesIO(data_file.read_bytes())

    refs["refs"]["v/0"] = ["s3://bucket/blob.bin", 8, 48]
    store = z.materialize_kerchunk_refs(refs, str(tmp_path / "s4"), opener=fake_opener)
    assert (z.read_zarr_array_local(store, "v") == payload).all()
    assert served == ["s3://bucket/blob.bin"]


def test_kerchunk_templated_refs_golden(tmp_path):
    """Kerchunk v1 templates/gen expansion (the fsspec ReferenceFileSystem
    semantics, from the published spec): template substitution in ref
    URLs, gen cartesian products with jinja arithmetic in key/url/offset,
    value-exact against the numpy source. Remote templates still raise
    the named seam at resolution time."""
    chunks = [np.arange(4, dtype="<f8") * (i + 1) for i in range(3)]
    data_file = tmp_path / "shards.bin"
    data_file.write_bytes(b"HDR!" + b"".join(c.tobytes() for c in chunks))
    refs = {
        "version": 1,
        "templates": {"u": f"file://{data_file}", "base": "4"},
        "gen": [
            {
                "key": "v/{{i}}",
                "url": "{{u}}",
                "offset": "{{base}}",  # jinja over a template var...
                "length": "32",
                "dimensions": {"i": {"stop": 1}},
            },
            {
                "key": "v/{{i + 1}}",
                "url": "{{u}}",
                "offset": "{{4 + (i + 1) * 32}}",  # ...and arithmetic
                "length": "32",
                "dimensions": {"i": {"start": 0, "stop": 2, "step": 1}},
            },
        ],
        "refs": {
            ".zgroup": '{"zarr_format":2}',
            "v/.zarray": json.dumps({
                "chunks": [4], "compressor": None, "dtype": "<f8",
                "fill_value": None, "filters": None, "order": "C",
                "shape": [12], "zarr_format": 2,
            }),
            "v/.zattrs": '{"_ARRAY_DIMENSIONS":["v"]}',
        },
    }
    store = z.materialize_kerchunk_refs(refs, str(tmp_path / "t"))
    got = z.read_zarr_array_local(store, "v")
    assert (got == np.concatenate(chunks)).all()
    # a template pointing at an http remote expands fine and the RESOLVE
    # step now goes through the stdlib ranged GET (no opener needed) — in
    # this offline sandbox that surfaces as the contract fetch error, not
    # the old opener seam; non-HTTP schemes still name the opener
    refs["templates"]["u"] = "http://example.invalid/shards.bin"
    with pytest.raises(z.ZarrError, match="HTTP fetch"):
        z.materialize_kerchunk_refs(refs, str(tmp_path / "t2"))
    refs["templates"]["u"] = "s3://bucket/shards.bin"
    with pytest.raises(z.ZarrError, match="opener"):
        z.materialize_kerchunk_refs(refs, str(tmp_path / "t3"))


def test_write_tall_blosc_distributed_roundtrip(spark, tmp_path):
    """The DEFAULT real-world v2 compressor (blosc lz4 + byte-shuffle)
    works through the DISTRIBUTED sink and source — chunk encode/decode
    runs in executor Python workers, so this also pins that the blosc
    codec module imports and runs worker-side."""
    sdf, pdf = _tall_df(spark)
    store = str(tmp_path / "wb")
    z.write_zarr_tall(
        sdf, store, "cents", ["t", "y", "x"], (1, 2, 2), fill_value=-1,
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    )
    meta = z.open_group(store)["cents"]
    assert meta.compressor["id"] == "blosc"
    # chunk files on disk really are blosc frames (format version byte 2)
    import glob as _glob

    chunk = sorted(
        p for p in _glob.glob(str(tmp_path / "wb" / "cents" / "*"))
        if not p.endswith((".zarray", ".zattrs"))
    )[0]
    with open(chunk, "rb") as f:
        assert f.read(1) == b"\x02"
    back = z.read_zarr_tall(spark, store, "cents", skip_fill=True)
    got = sorted((r["y"], r["x"], r["cents"]) for r in back.collect())
    want = sorted(zip(pdf["y"], pdf["x"], pdf["cents"]))
    assert [(y, x, c) for y, x, c in got] == [(int(y), int(x), int(c)) for y, x, c in want]


# ---------------------------------------------------------------------------
# Zarr v3 distributed WRITE surface
# ---------------------------------------------------------------------------


def test_write_tall_v3_distributed_roundtrip(spark, tmp_path):
    """zarr_format=3: per-node zarr.json, c/-keyed chunks, default
    bytes+zstd codecs, dimension_names, root inline consolidated
    metadata; the datetime axis is written as a v2 sibling (no v3
    datetime dtype) and the mixed store reads back through the same
    distributed reader."""
    sdf, pdf = _tall_df(spark)
    store = str(tmp_path / "v3")
    summary = z.write_zarr_tall(
        sdf, store, "cents", ["t", "y", "x"], (1, 2, 2), fill_value=-1,
        zarr_format=3,
    )
    assert summary["cells"] == 6
    root = json.loads((tmp_path / "v3" / "zarr.json").read_text())
    assert root["zarr_format"] == 3 and root["node_type"] == "group"
    cons = root["consolidated_metadata"]["metadata"]
    assert set(cons) == {"cents", "y", "x"}  # t is a v2 datetime sibling
    doc = json.loads((tmp_path / "v3" / "cents" / "zarr.json").read_text())
    assert doc["dimension_names"] == ["t", "y", "x"]
    assert [c["name"] for c in doc["codecs"]] == ["bytes", "zstd"]
    assert (tmp_path / "v3" / "t" / ".zarray").exists()
    assert (tmp_path / "v3" / "cents" / "c" / "0" / "0" / "0").exists()
    metas = z.open_group(store)
    assert metas["cents"].zarr_format == 3 and metas["t"].zarr_format == 2
    back = z.read_zarr_tall(spark, store, "cents", skip_fill=False)
    got = {(r["t"], r["y"], r["x"]): r["cents"] for r in back.collect()}
    for t, y, x, c in zip(pdf["t"], pdf["y"], pdf["x"], pdf["cents"]):
        assert got[(t.to_pydatetime(), y, x)] == c
    assert got[(pdf["t"][0].to_pydatetime(), 0, 7)] == -1  # fill cell


def test_write_tall_v3_sharded(spark, tmp_path):
    """A sharding_indexed codecs= config makes the distributed sink write
    SHARDS (one stored object per grid cell, inner chunks indexed)."""
    sdf, pdf = _tall_df(spark)
    store = str(tmp_path / "v3s")
    z.write_zarr_tall(
        sdf, store, "cents", ["t", "y", "x"], (2, 3, 2), fill_value=-1,
        zarr_format=3,
        codecs=[{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": [1, 2, 2],
                "codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}},
                    {"name": "zstd", "configuration": {"level": 1, "checksum": False}},
                ],
            },
        }],
    )
    # whole grid = one shard file
    assert (tmp_path / "v3s" / "cents" / "c" / "0" / "0" / "0").exists()
    back = z.read_zarr_tall(spark, store, "cents", skip_fill=True)
    got = sorted((r["y"], r["x"], r["cents"]) for r in back.collect())
    assert got == sorted(
        (int(y), int(x), int(c)) for y, x, c in zip(pdf["y"], pdf["x"], pdf["cents"])
    )


def test_write_tall_v3_rejects_v2_options(spark, tmp_path):
    sdf, _ = _tall_df(spark)
    with pytest.raises(z.ZarrError, match="codecs"):
        z.write_zarr_tall(
            sdf, str(tmp_path / "e1"), "cents", ["t", "y", "x"],
            zarr_format=3, compressor={"id": "zlib"},
        )
    with pytest.raises(z.ZarrError, match="v3 option"):
        z.write_zarr_tall(
            sdf, str(tmp_path / "e2"), "cents", ["t", "y", "x"],
            codecs=[{"name": "bytes"}],
        )


def test_kerchunk_gen_multi_dimension_product():
    """gen with two dimensions expands as a cartesian product; offsets and
    keys render per-combination (spec: dimensions may be ranges or lists)."""
    out = z._expand_kerchunk_templates(
        {},
        {"u": "file:///data/x.bin"},
        [
            {
                "key": "v/{{i}}.{{j}}",
                "url": "{{u}}",
                "offset": "{{(i * 2 + j) * 16}}",
                "length": "16",
                "dimensions": {"i": {"stop": 3}, "j": [0, 1]},
            }
        ],
    )
    assert len(out) == 6
    assert out["v/0.0"] == ["file:///data/x.bin", 0, 16]
    assert out["v/2.1"] == ["file:///data/x.bin", 80, 16]


def test_kerchunk_refs_malformed_single_exception_contract(tmp_path):
    """Refs JSON is untrusted input (SURVEY S9): mutated inline values,
    offsets, lengths and paths must raise ZarrError — never a raw
    binascii/unicode/OS error (same contract bar as the grib/blosc/hdf5
    parsers). A 4000-trial sweep ran clean when this landed; 1000 trials
    stay as the regression net."""
    import json as _json
    import random as _random
    import shutil as _shutil

    if not os.path.exists(_CHIRPS_REFS):
        pytest.skip("reference fixture absent")
    base = _json.dumps(_json.load(open(_CHIRPS_REFS)))
    rng = _random.Random(5)
    for trial in range(1000):
        mut = list(base)
        for _ in range(rng.randint(1, 5)):
            mut[rng.randrange(len(mut))] = chr(rng.randrange(32, 127))
        try:
            doc = _json.loads("".join(mut))
        except ValueError:
            continue  # the mutation broke the JSON itself
        dest = tmp_path / f"kfz_{trial}"
        try:
            z.materialize_kerchunk_refs(doc, str(dest))
        except z.ZarrError:
            pass
        finally:
            _shutil.rmtree(dest, ignore_errors=True)


def test_kerchunk_inline_base64_corruption_raises(tmp_path):
    """A corrupt inline value must RAISE, not decode to wrong bytes:
    b64decode without validate=True silently discards non-alphabet
    characters (only bad padding raises), so 'base64:AAA!A' would
    round-trip to the wrong chunk content. Pinned: the '!' corruption
    below decodes 'cleanly' under validate=False."""
    import base64 as _b64

    good = "base64:" + _b64.b64encode(b"\x01\x02\x03\x04").decode()
    z.materialize_kerchunk_refs({"v/0": good}, str(tmp_path / "ok"))
    assert (tmp_path / "ok" / "v" / "0").read_bytes() == b"\x01\x02\x03\x04"

    corrupt = good[:9] + "!" + good[9:]  # injected non-alphabet char
    assert _b64.b64decode(corrupt[len("base64:"):], validate=False)  # silent under False
    with pytest.raises(z.ZarrError, match="undecodable inline"):
        z.materialize_kerchunk_refs({"v/0": corrupt}, str(tmp_path / "bad"))


def test_kerchunk_http_refs_resolve_with_stdlib(tmp_path):
    """S6 remote byte-ranges WITHOUT an injected opener: http/https refs
    resolve through a stdlib ranged GET, proven against a real HTTP
    socket (localhost) — a Range-honoring server exercises the 206 path,
    the stdlib SimpleHTTPRequestHandler (which ignores Range) exercises
    the 200-full-body slice fallback; non-HTTP schemes still raise the
    named opener error."""
    import functools
    import http.server
    import threading

    blob = bytes(range(256)) * 4
    serve = tmp_path / "www"
    serve.mkdir()
    (serve / "data.bin").write_bytes(blob)

    class RangeHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                a, b = (int(x) for x in rng[len("bytes="):].split("-"))
                part = blob[a : b + 1]
                self.send_response(206)
                self.send_header("Content-Range", f"bytes {a}-{b}/{len(blob)}")
            else:
                part = blob
                self.send_response(200)
            self.send_header("Content-Length", str(len(part)))
            self.end_headers()
            self.wfile.write(part)

        def log_message(self, *a):  # keep pytest output clean
            pass

    for handler, label in (
        (RangeHandler, "206"),
        (functools.partial(
            http.server.SimpleHTTPRequestHandler, directory=str(serve)
        ), "200-fallback"),
    ):
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/data.bin"
            refs = {"a/0": [url, 16, 32], "a/1": [url], ".zattrs": "{}"}
            store = z.materialize_kerchunk_refs(
                refs, str(tmp_path / f"s_http_{label}")
            )
            got = (Path(store) / "a" / "0").read_bytes()
            assert got == blob[16:48], label
            assert (Path(store) / "a" / "1").read_bytes() == blob, label
        finally:
            srv.shutdown()
            srv.server_close()

    # non-HTTP remotes still need injection, with the named error
    with pytest.raises(z.ZarrError, match="opener"):
        z.materialize_kerchunk_refs(
            {"a/0": ["s3://bucket/key", 0, 4]}, str(tmp_path / "s_s3")
        )
    # a dead endpoint surfaces as the contract error, not a raw URLError
    with pytest.raises(z.ZarrError, match="HTTP fetch"):
        z.materialize_kerchunk_refs(
            {"a/0": ["http://127.0.0.1:9/x", 0, 4]}, str(tmp_path / "s_dead")
        )
