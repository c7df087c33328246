"""Blosc1 container / numcodecs LZ4 / Zstd codec tests (sources/blosc.py).

No c-blosc ground truth exists in this environment, so correctness is
pinned three ways: (1) hand-computed vectors for every layout rule the
format prescribes (header fields, byte-shuffle lane order, bitshuffle
bit-plane order, split-stream framing, stored-raw stream marker,
memcpy fallback); (2) property round-trips over random shapes, dtypes,
cnames, shuffles and blocksizes (including the split and leftover-block
paths); (3) the inner compressed streams themselves are produced AND
consumed by pyarrow's bundled upstream codecs (lz4 raw block, zstd,
snappy), so the parts with external ground truth use it.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from zarr_climate_etl_ipfs_spark.sources import blosc as B


# ---------------------------------------------------------------------------
# Shuffle filters — hand vectors
# ---------------------------------------------------------------------------


def test_byteshuffle_lane_order():
    # elements (00 01) (02 03) (04 05): lane0 = 00 02 04, lane1 = 01 03 05
    assert B.byteshuffle(b"\x00\x01\x02\x03\x04\x05", 2) == b"\x00\x02\x04\x01\x03\x05"
    assert B.byteunshuffle(b"\x00\x02\x04\x01\x03\x05", 2) == b"\x00\x01\x02\x03\x04\x05"


def test_byteshuffle_leftover_tail_verbatim():
    # 7 bytes, typesize 2: 3 whole elements shuffled, byte 6 verbatim
    out = B.byteshuffle(b"\x00\x01\x02\x03\x04\x05\xff", 2)
    assert out == b"\x00\x02\x04\x01\x03\x05\xff"


def test_bitshuffle_bit_plane_order():
    # 8 one-byte elements [1,1,0,...]: bit-plane 0 packs the LSBs of the
    # 8 elements little-endian -> 0b00000011; planes 1-7 empty
    assert B.bitshuffle(bytes([1, 1, 0, 0, 0, 0, 0, 0]), 1) == b"\x03" + b"\x00" * 7
    # identity check: element k = 1 << k makes plane k's byte = 1 << k
    diag = bytes(1 << k for k in range(8))
    assert B.bitshuffle(diag, 1) == diag


def test_bitshuffle_partial_group_verbatim():
    # 11 one-byte elements: 8 transposed, trailing 3 verbatim
    data = bytes([1] * 8 + [0xAA, 0xBB, 0xCC])
    out = B.bitshuffle(data, 1)
    assert out[-3:] == b"\xaa\xbb\xcc"
    assert B.bitunshuffle(out, 1) == data


@given(
    st.integers(1, 12),
    st.binary(min_size=0, max_size=4096),
)
@settings(max_examples=60, deadline=None)
def test_shuffles_roundtrip(typesize, data):
    assert B.byteunshuffle(B.byteshuffle(data, typesize), typesize) == data
    assert B.bitunshuffle(B.bitshuffle(data, typesize), typesize) == data


# ---------------------------------------------------------------------------
# Blosc1 container — layout pins
# ---------------------------------------------------------------------------


def test_header_fields_and_split_flag():
    data = np.arange(100_000, dtype="<f8").tobytes()
    f = B.blosc_compress(data, typesize=8, cname="lz4", clevel=5, shuffle=B.SHUFFLE)
    version, versionlz, flags, typesize = f[0], f[1], f[2], f[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", f, 4)
    assert (version, versionlz) == (2, 1)
    assert typesize == 8 and nbytes == len(data) and cbytes == len(f)
    assert flags & 0x1  # byte-shuffle
    assert not (flags & 0x10)  # lz4 + typesize 8 splits per c-blosc's rule
    assert flags >> 5 == 1  # lz4 format code
    assert blocksize % 8 == 0
    assert B.blosc_decompress(f) == data


def test_zstd_frames_never_split():
    data = np.arange(50_000, dtype="<f4").tobytes()
    f = B.blosc_compress(data, typesize=4, cname="zstd", clevel=3, shuffle=B.SHUFFLE)
    assert f[2] & 0x10  # dont-split set: only blosclz/lz4 split
    assert f[2] >> 5 == 5  # zstd format code
    assert B.blosc_decompress(f) == data


def test_split_streams_are_lane_slices():
    """For a split lz4 frame, each stream decodes to one byte lane of the
    shuffled block — verified by parsing the container by hand."""
    data = np.arange(4096, dtype="<u2").tobytes()  # 8192 bytes, typesize 2
    f = B.blosc_compress(
        data, typesize=2, cname="lz4", clevel=5, shuffle=B.SHUFFLE, blocksize=8192
    )
    assert not (f[2] & 0x10)
    (bstart,) = struct.unpack_from("<I", f, 16)
    shuffled = B.byteshuffle(data, 2)
    pos = bstart
    lanes = []
    for _ in range(2):  # nsplits == typesize
        (sc,) = struct.unpack_from("<I", f, pos)
        pos += 4
        raw = f[pos : pos + sc]
        pos += sc
        lanes.append(
            bytes(raw) if sc == 4096 else B._stream_decompress(1, raw, 4096)
        )
    assert b"".join(lanes) == shuffled


def test_stored_raw_stream_marker():
    """An incompressible lane is stored raw with size == lane size, but
    the frame as a whole falls back to memcpy when nothing compresses."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    f = B.blosc_compress(data, typesize=1, cname="lz4", shuffle=B.NOSHUFFLE)
    assert f[2] & 0x2  # memcpy fallback
    assert f[16:] == data
    assert B.blosc_decompress(f) == data


def test_clevel_zero_is_memcpy():
    data = b"abc" * 1000
    f = B.blosc_compress(data, typesize=1, clevel=0)
    assert f[2] & 0x2 and B.blosc_decompress(f) == data


def test_leftover_block_and_multiblock():
    # 3 full blocks of 1024 + a 513-byte leftover block
    data = (np.arange(3585, dtype=np.uint8) % 251).tobytes()
    f = B.blosc_compress(
        data, typesize=1, cname="lz4", clevel=5, shuffle=B.NOSHUFFLE, blocksize=1024
    )
    nbytes, blocksize, _ = struct.unpack_from("<III", f, 4)
    assert (nbytes, blocksize) == (3585, 1024)
    assert B.blosc_decompress(f) == data


def test_empty_and_tiny_inputs():
    assert B.blosc_decompress(B.blosc_compress(b"", typesize=4)) == b""
    assert B.blosc_decompress(B.blosc_compress(b"\x07", typesize=8)) == b"\x07"


def test_autoshuffle_follows_numcodecs():
    f1 = B.blosc_compress(b"\x01\x02" * 600, typesize=1, shuffle=B.AUTOSHUFFLE)
    assert f1[2] & 0x4  # itemsize 1 -> bitshuffle
    f2 = B.blosc_compress(
        np.arange(300, dtype="<i4").tobytes(), typesize=4, shuffle=B.AUTOSHUFFLE
    )
    assert f2[2] & 0x1  # wider items -> byte-shuffle


def test_truncated_and_corrupt_frames_raise():
    data = np.arange(1000, dtype="<f4").tobytes()
    f = B.blosc_compress(data, typesize=4, cname="lz4")
    with pytest.raises(B.BloscError):
        B.blosc_decompress(f[:10])
    with pytest.raises(B.BloscError):
        B.blosc_decompress(f[:40])
    with pytest.raises(B.BloscError):
        B.blosc_decompress(b"")


def test_unknown_cname_raises():
    with pytest.raises(B.BloscError, match="cname"):
        B.blosc_compress(b"xx", cname="lzma")


@given(
    data=st.binary(min_size=0, max_size=20000),
    typesize=st.sampled_from([1, 2, 3, 4, 8, 16]),
    cname=st.sampled_from(["lz4", "lz4hc", "zstd", "zlib", "snappy", "blosclz"]),
    shuffle=st.sampled_from([0, 1, 2, -1]),
    blocksize=st.sampled_from([0, 256, 999, 4096]),
)
@settings(max_examples=80, deadline=None)
def test_blosc_roundtrip_property(data, typesize, cname, shuffle, blocksize):
    f = B.blosc_compress(
        data, typesize=typesize, cname=cname, clevel=5, shuffle=shuffle, blocksize=blocksize
    )
    assert B.blosc_decompress(f) == data


# ---------------------------------------------------------------------------
# blosclz streams — hand vectors pinned token-by-token from the published
# format description (blosc.py's blosclz section); these anchor the decoder
# so the encoder round-trips below aren't merely self-consistent
# ---------------------------------------------------------------------------


def test_blosclz_hand_vectors_decode():
    # literal run: ctrl=3 -> 4 literal bytes
    assert B.blosclz_decompress(bytes([0x03]) + b"abcd", 4) == b"abcd"
    # near match: "abcd" + copy 4 from distance 4
    # ctrl = (len 4-2)<<5 | ofs_hi 0 = 0x40; code = dist-1 = 3
    assert (
        B.blosclz_decompress(bytes([0x03]) + b"abcd" + bytes([0x40, 0x03]), 8)
        == b"abcdabcd"
    )
    # RLE overlap: 'a' + copy 7 from distance 1 -> 8 a's
    # ctrl = (7-2)<<5 = 0xA0; code = 0
    assert B.blosclz_decompress(bytes([0x00, ord("a"), 0xA0, 0x00]), 8) == b"a" * 8
    # chained length: copy 300 from distance 1 = 'x' * 301
    # ctrl = 7<<5 = 0xE0; chain 255 then 36 (6+255+36+3 = 300); code 0
    frame = bytes([0x00, ord("x"), 0xE0, 0xFF, 0x24, 0x00])
    assert B.blosclz_decompress(frame, 301) == b"x" * 301
    # chain ending in 0 is legal: 6+255+0+3 = 264
    frame = bytes([0x00, ord("y"), 0xE0, 0xFF, 0x00, 0x00])
    assert B.blosclz_decompress(frame, 265) == b"y" * 265


def test_blosclz_far_distance_decode():
    # 8500 literals, then copy 3 from distance 8500: the near space tops
    # out at 8191, so this must take the far escape
    # ctrl = (3-2)<<5 | 31 = 0x3F; code = 255; d16 = 8500 - 8192 = 308
    lits = bytearray()
    data = bytes(range(256)) * 34  # 8704 bytes, take 8500
    data = data[:8500]
    p = 0
    while p < len(data):
        run = min(32, len(data) - p)
        lits.append(run - 1)
        lits += data[p : p + run]
        p += run
    frame = bytes(lits) + bytes([0x3F, 0xFF, 308 >> 8, 308 & 255])
    out = B.blosclz_decompress(frame, 8503)
    assert out[:8500] == data and out[8500:] == data[:3]
    # near/far boundary continuity: distance 8191 near-encodes
    # (ofs_hi 31, code 254: 7936 + 254 + 1 = 8191)
    frame = bytes(lits) + bytes([0x3F, 0xFE])
    out = B.blosclz_decompress(frame, 8503)
    assert out[8500:] == data[8500 - 8191 : 8500 - 8191 + 3]


def test_blosclz_malformed_raises():
    with pytest.raises(B.BloscError, match="before output start"):
        B.blosclz_decompress(bytes([0x00, ord("a"), 0x40, 0x09]), 8)
    with pytest.raises(B.BloscError, match="truncated"):
        B.blosclz_decompress(bytes([0x05]) + b"ab", 6)
    with pytest.raises(B.BloscError, match="truncated"):
        B.blosclz_decompress(bytes([0x00, ord("a"), 0xE0, 0xFF]), 300)


@given(st.binary(min_size=0, max_size=30000))
@settings(max_examples=60, deadline=None)
def test_blosclz_roundtrip_property(data):
    assert B.blosclz_decompress(B.blosclz_compress(data), len(data)) == data


def test_blosclz_compresses_repetitive_data():
    data = (b"climatology-" * 4096)[:32768]
    enc = B.blosclz_compress(data)
    assert len(enc) < len(data) // 8
    assert B.blosclz_decompress(enc, len(data)) == data


# ---------------------------------------------------------------------------
# numcodecs LZ4 / Zstd wrappers
# ---------------------------------------------------------------------------


def test_lz4_nc_size_prefix():
    data = b"ab" * 500
    enc = B.lz4_nc_encode(data)
    assert struct.unpack_from("<I", enc, 0)[0] == 1000
    assert B.lz4_nc_decode(enc) == data
    assert B.lz4_nc_decode(B.lz4_nc_encode(b"")) == b""
    with pytest.raises(B.BloscError):
        B.lz4_nc_decode(b"\x01\x02")


def test_zstd_nc_frame_and_content_size():
    data = np.arange(5000, dtype="<i8").tobytes()
    enc = B.zstd_nc_encode(data, 3)
    assert struct.unpack_from("<I", enc, 0)[0] == 0xFD2FB528
    assert B.zstd_frame_content_size(enc) == len(data)
    assert B.zstd_nc_decode(enc) == data
    with pytest.raises(B.BloscError, match="magic"):
        B.zstd_nc_decode(b"\x00" * 10)


@given(st.binary(min_size=0, max_size=30000))
@settings(max_examples=40, deadline=None)
def test_nc_wrappers_roundtrip(data):
    assert B.lz4_nc_decode(B.lz4_nc_encode(data)) == data
    assert B.zstd_nc_decode(B.zstd_nc_encode(data, 1)) == data


# ---------------------------------------------------------------------------
# fuzz: malformed foreign bytes must raise BloscError, never leak raw
# struct.error/zlib.error/IndexError or over-allocate on forged headers
# ---------------------------------------------------------------------------


@given(st.binary(max_size=256), st.integers(0, 400))
@settings(max_examples=200, deadline=None)
def test_blosclz_decode_fuzz_contract(data, nbytes):
    try:
        out = B.blosclz_decompress(data, nbytes)
        assert len(out) == nbytes
    except B.BloscError:
        pass


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_blosc_container_fuzz_contract(frame):
    try:
        B.blosc_decompress(frame)
    except B.BloscError:
        pass


def test_forged_header_block_count_raises_not_allocates():
    # nbytes=4 GiB, blocksize=1 -> 4e9 "blocks"; must raise the contract
    # type without attempting the 16 GiB bstarts unpack
    frame = struct.pack("<BBBBIII", 2, 1, 0x20, 1, 2**32 - 1, 1, 64) + b"\0" * 48
    with pytest.raises(B.BloscError, match="blocks"):
        B.blosc_decompress(frame)
