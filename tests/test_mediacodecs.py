"""Pure-stdlib media codecs: PNG/PPM/BMP/WAV round-trips and the Spark
multimodal pipeline running REAL decode end to end."""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from zarr_climate_etl_ipfs_spark import mediacodecs as mc

RNG = np.random.RandomState(11)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = RNG.randint(0, 256, (13, 7, channels), dtype=np.uint8)
    out, meta = mc.decode_png(mc.encode_png(img))
    assert np.array_equal(out, img)
    assert (meta["width"], meta["height"], meta["n_channels"]) == (7, 13, channels)


def test_png_all_five_filters_decode():
    """Hand-filter each scanline with a different filter type per the PNG
    spec and check the decoder reconstructs the original pixels."""
    img = RNG.randint(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        filt = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    out, _ = mc.decode_png(png)
    assert np.array_equal(out, img)


def test_ppm_pgm_roundtrip():
    rgb = RNG.randint(0, 256, (9, 4, 3), dtype=np.uint8)
    gray = RNG.randint(0, 256, (3, 8, 1), dtype=np.uint8)
    out, meta = mc.decode_ppm(mc.encode_ppm(rgb))
    assert np.array_equal(out, rgb) and meta["format"] == "ppm"
    out, meta = mc.decode_ppm(mc.encode_ppm(gray))
    assert np.array_equal(out, gray) and meta["format"] == "pgm"


def test_bmp_decode_bottom_up_bgr():
    img = RNG.randint(0, 256, (3, 5, 3), dtype=np.uint8)
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_bytes - len(row))
    off = 14 + 40
    bmp = (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<Iii", 40, w, h)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<IIiiII", 0, len(body), 2835, 2835, 0, 0)
        + body
    )
    out, meta = mc.decode_bmp(bmp)
    assert np.array_equal(out, img)
    assert (meta["width"], meta["height"]) == (w, h)


def test_wav_roundtrip_and_meta():
    t = np.arange(16000, dtype=np.float32) / 16000.0
    stereo = np.stack(
        [np.sin(2 * np.pi * 440 * t) * 0.5, np.sin(2 * np.pi * 220 * t) * 0.25], axis=1
    )
    out, meta = mc.decode_wav(mc.encode_wav(stereo, sample_rate=16000))
    assert out.shape == (16000, 2)
    assert meta["sample_rate"] == 16000 and meta["duration_ms"] == 1000
    assert np.abs(out - stereo).max() <= 0.5 / 32768 + 1e-7


def test_image_dispatch_and_external_format_error():
    img = RNG.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    for payload in (mc.encode_png(img), mc.encode_ppm(img)):
        out, _ = mc.decode_image(payload)
        assert np.array_equal(out, img)
    # JPEG now decodes for real; a truncated JPEG is a decode error, not a
    # missing-dependency NotImplementedError
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_image(b"\xff\xd8\xff\xe0rest-of-jpeg")
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_image(b"garbage bytes here")


def test_extract_features_real_decode_on_spark(spark):
    """The multimodal pipeline with the REAL default decoder: PNG and PPM
    rows decode, a JPEG row degrades to decode_ok=false naming the missing
    dependency, garbage rows degrade with a parse error — stage survives."""
    from zarr_climate_etl_ipfs_spark import multimodal as mm

    img = RNG.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(mc.encode_png(img))),
        (2, bytearray(mc.encode_ppm(img))),
        (3, bytearray(b"\xff\xd8\xff\xe0 fake jpeg")),
        (4, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in mm.extract_features(df).collect()}
    assert got[1]["decode_ok"] and got[2]["decode_ok"]
    # identical pixels through two formats → identical features
    assert got[1]["feature"] == got[2]["feature"]
    assert got[1]["feature"][0] == 8.0 and got[1]["feature"][1] == 6.0
    assert not got[3]["decode_ok"] and "JPEG" in got[3]["error"]
    assert not got[4]["decode_ok"]


def test_audio_features_on_spark(spark):
    from zarr_climate_etl_ipfs_spark import multimodal as mm

    t = np.arange(8000, dtype=np.float32) / 8000.0
    wav = mc.encode_wav(np.sin(2 * np.pi * 100 * t) * 0.9, sample_rate=8000)
    df = spark.createDataFrame([(7, bytearray(wav))], "doc_id long, content binary")
    got = mm.extract_features(df, decoder=mm.default_audio_decoder).first()
    assert got["decode_ok"]
    n, ch, rate, dur_ms = got["feature"][:4]
    assert (n, ch, rate, dur_ms) == (8000.0, 1.0, 8000.0, 1000.0)
    rms = got["feature"][4]
    assert abs(rms - 0.9 / np.sqrt(2)) < 0.01


# -- property round-trips (pure numpy, no Spark) -----------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
    out, meta = mc.decode_png(mc.encode_png(img))
    assert np.array_equal(out, img)
    assert (meta["height"], meta["width"], meta["n_channels"]) == (h, w, c)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=4000),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    x = np.random.RandomState(seed).uniform(-0.99, 0.99, (n, ch)).astype(np.float32)
    out, meta = mc.decode_wav(mc.encode_wav(x, sample_rate=rate))
    assert out.shape == (n, ch)
    assert meta["sample_rate"] == rate
    assert np.abs(out - x).max() <= 0.5 / 32768 + 1e-7


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=2, max_value=200),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(h, w, ncolors, interlace, seed):
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    img = palette[rng.randint(0, ncolors, (h, w))]
    out, meta = mc.decode_gif(mc.encode_gif(img, interlace=interlace))
    assert np.array_equal(out, img)
    assert (meta["height"], meta["width"], meta["n_frames"]) == (h, w, 1)


def test_gif_dispatch_and_multiframe_meta():
    """decode_image routes GIF by magic; a two-frame GIF decodes frame 1
    and reports n_frames=2."""
    img1 = RNG.randint(0, 4, (9, 11), dtype=np.uint8)
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    rgb1 = palette[img1]
    encoded = bytearray(mc.encode_gif(rgb1))
    # splice a second (identical) image block before the trailer
    body_start = encoded.index(0x2C, 13 + 4 * 3)
    frame = bytes(encoded[body_start:-1])  # image block without trailer
    two = bytes(encoded[:-1]) + frame + b"\x3b"
    out, meta = mc.decode_image(bytes(two))
    assert np.array_equal(out, rgb1)
    assert meta["n_frames"] == 2


def test_gif_lzw_width_growth_and_clear():
    """A large high-entropy image forces the LZW dict through width growth
    to 12 bits and a mid-stream CLEAR; round-trip must survive both."""
    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    img = palette[rng.randint(0, 256, (80, 90))]
    out, _ = mc.decode_gif(mc.encode_gif(img))
    assert np.array_equal(out, img)


def test_gif_rejects_garbage():
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_webp_raises_named_notimplemented():
    """RIFF....WEBP must name libwebp, and RIFF/WAVE must not be mistaken
    for WebP by the offset-aware check."""
    fake_webp = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(NotImplementedError, match="libwebp"):
        mc.decode_image(fake_webp)
    wav = mc.encode_wav(np.zeros((16, 1), dtype=np.float32))
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_image(wav)  # RIFF/WAVE is not an image — generic error


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, c, big_endian, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
    out, meta = mc.decode_tiff(mc.encode_tiff(img, big_endian=big_endian))
    assert np.array_equal(out, img)
    assert (meta["height"], meta["width"], meta["channels"]) == (h, w, c)
    assert meta["byte_order"] == ("big" if big_endian else "little")


def test_tiff_dispatch_and_compressed_raises():
    img = RNG.randint(0, 256, (6, 5, 3), dtype=np.uint8)
    blob = mc.encode_tiff(img)
    out, meta = mc.decode_image(blob)
    assert np.array_equal(out, img) and meta["format"] == "tiff"
    # flip the compression tag (259) to JPEG (6): must raise naming JPEG
    # (LZW, the old seam here, is now a supported codec — tests below)
    bo_idx = blob.index(b"\x03\x01")  # tag 259 little-endian in IFD
    hacked = blob[: bo_idx + 8] + b"\x06\x00\x00\x00" + blob[bo_idx + 12 :]
    with pytest.raises(NotImplementedError, match="JPEG"):
        mc.decode_tiff(hacked)


def _pack_msb(codes_widths):
    """Independent MSB-first bit packer for the hand-pinned LZW vectors."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_hand_vector():
    """The TIFF6 §13 conventions pinned token-by-token: CLEAR=256, EOI=257,
    first dynamic code 258, MSB-first packing, all codes 9-bit for this
    short payload. Code sequence derived by hand from the greedy algorithm
    on 7 7 7 8 8 7 7 6 6: 256 | 7 | 258(=77) | 8 | 8 | 258 | 6 | 6 | 257."""
    payload = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    stream = _pack_msb([(c, 9) for c in (256, 7, 258, 8, 8, 258, 6, 6, 257)])
    assert mc._tiff_lzw_encode(payload) == stream
    assert mc._tiff_lzw_decode(stream, len(payload)) == payload


def test_tiff_lzw_early_change_boundary():
    """The 9->10 width switch happens ONE CODE EARLIER than GIF (the spec's
    'early change'): a 256-byte all-distinct ramp emits literals 0..255;
    the decoder performs its 253rd table add while consuming literal 253,
    reaching table size 511 = 2^9 - 1, so literal 254 onward reads at 10
    bits. The stream here is built by the independent packer from that
    hand-derived schedule — if either side's width rule drifts, this
    fails."""
    ramp = bytes(range(256))
    codes = [(256, 9)] + [(i, 9) for i in range(254)]
    codes += [(254, 10), (255, 10), (257, 10)]
    stream = _pack_msb(codes)
    assert mc._tiff_lzw_decode(stream, len(ramp)) == ramp
    assert mc._tiff_lzw_encode(ramp) == stream


def test_tiff_lzw_roundtrip_shapes():
    """Round-trips across the structurally distinct regimes: the KwKwK
    deferred-code case (runs), table growth through every width (large
    varied data crosses 511/1023/2047 and the 4094 CLEAR restart), empty
    payload, and incompressible bytes."""
    rng = np.random.RandomState(7)
    cases = [
        b"",
        b"a" * 1000,  # KwKwK: code == len(table) on the second symbol
        bytes(range(256)) * 40,
        rng.randint(0, 256, 200_000, dtype=np.uint8).tobytes(),  # CLEAR restart
        bytes(rng.randint(0, 4, 50_000, dtype=np.uint8)),  # low-entropy
    ]
    for payload in cases:
        enc = mc._tiff_lzw_encode(payload)
        assert mc._tiff_lzw_decode(enc, len(payload)) == payload
    # the random 200k case really exercised a table restart
    big = rng.randint(0, 256, 200_000, dtype=np.uint8).tobytes()
    assert len(mc._tiff_lzw_encode(big)) > 4096 * 12 // 8


def test_tiff_lzw_bomb_guard():
    """A stream expanding past the declared strip size must raise, not
    allocate: compress 1 MiB of zeros, declare 1000 bytes."""
    enc = mc._tiff_lzw_encode(b"\x00" * (1 << 20))
    with pytest.raises(mc.MediaDecodeError, match="exceeds declared"):
        mc._tiff_lzw_decode(enc, 1000)


def test_packbits_spec_vector():
    """The TIFF6 §9 worked example, an EXTERNAL golden vector: the spec's
    packed bytes must decode to the spec's unpacked bytes."""
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert mc._packbits_decode(packed, len(unpacked)) == unpacked
    # our greedy encoder round-trips the same payload (packing may differ)
    assert mc._packbits_decode(
        mc._packbits_encode(unpacked), len(unpacked)
    ) == unpacked


def test_packbits_roundtrip_and_guards():
    rng = np.random.RandomState(3)
    for payload in (
        b"",
        b"\x00" * 500,  # long runs split at 128
        bytes(rng.randint(0, 256, 10_000, dtype=np.uint8)),  # literals
        b"ababab" + b"x" * 129 + b"zz",  # mixed, run straddling token cap
    ):
        enc = mc._packbits_encode(payload)
        assert mc._packbits_decode(enc, len(payload)) == payload
    with pytest.raises(mc.MediaDecodeError, match="exceeds declared"):
        mc._packbits_decode(mc._packbits_encode(b"\x00" * 1000), 10)
    with pytest.raises(mc.MediaDecodeError, match="truncated"):
        mc._packbits_decode(b"\xfe", 100)  # repeat token without its byte
    with pytest.raises(mc.MediaDecodeError, match="truncated literal"):
        mc._packbits_decode(b"\x04ab", 100)  # literal run of 5, 2 bytes left


def test_tiff_strip_byte_counts_required_when_not_derivable():
    """A missing StripByteCounts is only recoverable for ONE uncompressed
    strip; with multiple offsets (or any compression) zip() would silently
    drop every strip after the first. Both forged flavors must raise the
    contract error, and a count/offset arity mismatch must too."""
    img = np.arange(96, dtype=np.uint8).reshape(8, 4, 3)
    blob = bytearray(mc.encode_tiff(img, compression="packbits", rows_per_strip=3))
    # find and excise the StripByteCounts (tag 279) IFD entry
    (ifd_off,) = __import__("struct").unpack("<I", bytes(blob[4:8]))
    (n,) = __import__("struct").unpack("<H", bytes(blob[ifd_off : ifd_off + 2]))
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (tag,) = __import__("struct").unpack("<H", bytes(blob[e : e + 2]))
        if tag == 279:
            blob[e : e + 2] = (0).to_bytes(2, "little")  # unknown tag: skipped
            break
    else:  # pragma: no cover
        raise AssertionError("encoder wrote no StripByteCounts")
    with pytest.raises(mc.MediaDecodeError, match="StripByteCounts required"):
        mc.decode_tiff(bytes(blob))
    # arity mismatch: forge the tag's count down to 1 (3 offsets remain)
    blob2 = bytearray(mc.encode_tiff(img, compression="packbits", rows_per_strip=3))
    (ifd_off,) = __import__("struct").unpack("<I", bytes(blob2[4:8]))
    (n,) = __import__("struct").unpack("<H", bytes(blob2[ifd_off : ifd_off + 2]))
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (tag,) = __import__("struct").unpack("<H", bytes(blob2[e : e + 2]))
        if tag == 279:
            blob2[e + 4 : e + 8] = (1).to_bytes(4, "little")
            break
    with pytest.raises(mc.MediaDecodeError, match="strip offsets but"):
        mc.decode_tiff(bytes(blob2))
    # single uncompressed strip stays recoverable without the tag
    blob1 = bytearray(mc.encode_tiff(img))
    (ifd_off,) = __import__("struct").unpack("<I", bytes(blob1[4:8]))
    (n,) = __import__("struct").unpack("<H", bytes(blob1[ifd_off : ifd_off + 2]))
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (tag,) = __import__("struct").unpack("<H", bytes(blob1[e : e + 2]))
        if tag == 279:
            blob1[e : e + 2] = (0).to_bytes(2, "little")
            break
    out, _ = mc.decode_tiff(bytes(blob1))
    assert np.array_equal(out, img)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.sampled_from([1, 3]),
    st.booleans(),
    st.sampled_from(["lzw", "deflate", "packbits"]),
    st.sampled_from([1, 2]),
    st.sampled_from([None, 3]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_tiff_compressed_file_roundtrip_property(
    h, w, c, big_endian, compression, predictor, rps, seed
):
    """Whole-file compressed TIFFs round-trip across all three codecs,
    byte orders, the horizontal-differencing predictor, and multi-strip
    layout (each strip is an independent compressed stream)."""
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
    blob = mc.encode_tiff(
        img, big_endian=big_endian, compression=compression,
        predictor=predictor, rows_per_strip=rps,
    )
    out, meta = mc.decode_tiff(blob)
    assert np.array_equal(out, img)
    assert meta["compression"] == compression


def test_tiff_lzw_fuzz_fails_cleanly():
    """Mutated compressed TIFFs must decode or raise the contract error —
    never hang, alloc-bomb, or leak a foreign exception (the grib2/blosc
    hardening bar). Rotates all three codecs."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 13, 3), dtype=np.uint8)
    bases = [
        bytearray(mc.encode_tiff(img, compression=comp, predictor=2,
                                 rows_per_strip=5))
        for comp in ("lzw", "deflate", "packbits")
    ]
    for trial in range(2100):
        blob = bytearray(bases[trial % 3])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(8, len(blob))]
        try:
            mc.decode_tiff(bytes(blob))
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def test_tiff_rejects_garbage():
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_tiff(b"XX\x00\x00" + b"\x00" * 16)


def test_tiff_lzw_final_code_width_threshold():
    """Round-12 tiled-TIFF catch, pinned: the decoder performs one more
    table add after the LAST data code; when that add lands exactly on
    the early-change threshold (decoder size == 2^width - 1) it reads EOI
    one bit wider than the encoder wrote it — MSB-first packing turns
    that into a desync ('stream ended without EOI'). ~1/2^width of
    streams end in this zone, which is why thousands of prior round-trips
    missed it. The exact 768-byte payload that caught it, plus a sweep of
    lengths crossing the 9→10 threshold with fresh-entry-per-byte data."""
    rng = np.random.RandomState(44)
    img = rng.randint(0, 256, (20, 25, 3), np.uint8)
    pad = np.pad(img, ((0, 12), (0, 7), (0, 0)), mode="edge")
    payload = pad[:16, :16].tobytes()
    assert mc._tiff_lzw_decode(mc._tiff_lzw_encode(payload), len(payload)) == payload
    rng2 = np.random.RandomState(7)
    for n in range(240, 270):  # random bytes ≈ one table add each: spans 511
        p = bytes(rng2.randint(0, 256, n, dtype=np.uint8))
        assert mc._tiff_lzw_decode(mc._tiff_lzw_encode(p), n) == p, n


def test_tiff_tiled_roundtrip_matrix():
    """TIFF6 §15 tiled layout (the GeoTIFF convention): every codec,
    predictor 2 (differencing restarts per tile edge), both byte orders,
    multiple tile shapes, edge tiles padded and cropped; JPEG tiles exact
    at quality 100 on constant content, with and without shared
    JPEGTables."""
    rng = np.random.RandomState(21)
    for (h, w, c) in [(20, 25, 3), (16, 16, 1), (5, 7, 3), (33, 50, 3)]:
        img = rng.randint(0, 256, (h, w, c), np.uint8)
        if c == 1:
            img = img[:, :, 0]
        ref = img if img.ndim == 3 else img[:, :, None]
        for comp in ("none", "lzw", "deflate", "packbits"):
            for pred in (1, 2):
                blob = mc.encode_tiff(img, compression=comp, predictor=pred,
                                      big_endian=(h + w) % 2 == 0,
                                      tile_size=(16, 16))
                out, meta = mc.decode_tiff(blob)
                assert np.array_equal(out, ref), (h, w, c, comp, pred)
                assert meta["compression"] == comp
        const = np.full((h, w, 3), 173, np.uint8)
        for sh in (False, True):
            out, _ = mc.decode_tiff(mc.encode_tiff(
                const, compression="jpeg", quality=100,
                tile_size=(16, 16), shared_jpeg_tables=sh))
            assert np.array_equal(out, const), (h, w, sh)
    # non-square tiles + lossy jpeg fidelity across tile seams
    yy, xx = np.mgrid[0:40, 0:56]
    grad = np.stack([yy * 255 // 40, xx * 255 // 56, (yy + xx) * 255 // 96],
                    -1).astype(np.uint8)
    out, _ = mc.decode_tiff(mc.encode_tiff(grad, compression="lzw",
                                           predictor=2, tile_size=(32, 16)))
    assert np.array_equal(out, grad)
    out, _ = mc.decode_tiff(mc.encode_tiff(grad, compression="jpeg", quality=92,
                                           tile_size=(16, 16),
                                           shared_jpeg_tables=True))
    assert _psnr(grad, out) > 40.0


def test_tiff_tiled_guards():
    """Tile-layout contract errors: non-multiple-of-16 tile size at encode,
    missing tile tags, tile-count arity mismatch, and a forged huge tile
    canvas all raise before any oversized allocation."""
    import struct as _s

    img = np.full((20, 20, 3), 9, np.uint8)
    with pytest.raises(ValueError, match="multiples of 16"):
        mc.encode_tiff(img, tile_size=(15, 16))
    blob = bytearray(mc.encode_tiff(img, compression="lzw", tile_size=(16, 16)))
    (ifd_off,) = _s.unpack("<I", bytes(blob[4:8]))
    (n,) = _s.unpack("<H", bytes(blob[ifd_off : ifd_off + 2]))
    locs = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (tag,) = _s.unpack("<H", bytes(blob[e : e + 2]))
        locs[tag] = e
    # drop TileByteCounts (325): incomplete tile tag set must raise
    bad = bytearray(blob)
    bad[locs[325] : locs[325] + 2] = (0).to_bytes(2, "little")
    with pytest.raises(mc.MediaDecodeError, match="missing tile_byte_counts"):
        mc.decode_tiff(bytes(bad))
    # forge tile count arity: claim 1 offset for a 2x2 tile grid
    bad = bytearray(blob)
    bad[locs[324] + 4 : locs[324] + 8] = (1).to_bytes(4, "little")
    with pytest.raises(mc.MediaDecodeError, match="offsets"):
        mc.decode_tiff(bytes(bad))
    # forged giant tile size dies on the PADDED-CANVAS guard before any
    # allocation: also forge the offset/count tags down to the single tile
    # the giant geometry implies, so the arity check passes and the canvas
    # guard is the one that fires
    bad = bytearray(blob)
    bad[locs[322] + 8 : locs[322] + 12] = _s.pack("<HH", 32768, 0)
    bad[locs[323] + 8 : locs[323] + 12] = _s.pack("<HH", 32768, 0)
    bad[locs[324] + 4 : locs[324] + 8] = (1).to_bytes(4, "little")
    bad[locs[325] + 4 : locs[325] + 8] = (1).to_bytes(4, "little")
    with pytest.raises(mc.MediaDecodeError, match="implausible canvas"):
        mc.decode_tiff(bytes(bad))


def test_tiff_tiled_fuzz_fails_cleanly():
    """Hardening net for the tiled entry points (lzw+predictor and
    jpeg+tables flavors): mutated tiled TIFFs decode or raise the
    contract error. 800-trial regression net (a 4000-trial sweep ran
    clean when this landed)."""
    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (20, 18, 3), dtype=np.uint8)
    bases = [
        bytearray(mc.encode_tiff(img, compression="lzw", predictor=2,
                                 tile_size=(16, 16))),
        bytearray(mc.encode_tiff(img, compression="jpeg", quality=90,
                                 tile_size=(16, 16), shared_jpeg_tables=True)),
    ]
    for trial in range(800):
        blob = bytearray(bases[trial % 2])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(8, len(blob))]
        try:
            mc.decode_tiff(bytes(blob))
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def test_tiff_jpeg_constant_blocks_bit_exact():
    """TIFF compression 7 (TechNote 2 new-style JPEG): per-strip JPEG
    streams decode through the in-repo SOF0 machinery; at quality=100 a
    constant raster is DC-only and round-trips bit-exactly — the property
    the multimodal catalog oracle relies on. Covers single-strip,
    multi-strip, shared JPEGTables, grayscale, and both byte orders."""
    img = np.full((11, 7, 3), 163, dtype=np.uint8)
    for shared in (False, True):
        for rps in (None, 4):
            for be in (False, True):
                blob = mc.encode_tiff(
                    img, compression="jpeg", quality=100, big_endian=be,
                    rows_per_strip=rps, shared_jpeg_tables=shared,
                )
                out, meta = mc.decode_tiff(blob)
                assert np.array_equal(out, img), (shared, rps, be)
                assert meta["compression"] == "jpeg"
    gray = np.full((9, 6), 42, dtype=np.uint8)
    out, meta = mc.decode_tiff(
        mc.encode_tiff(gray, compression="jpeg", quality=100,
                       rows_per_strip=4, shared_jpeg_tables=True)
    )
    assert np.array_equal(out[:, :, 0], gray) and meta["channels"] == 1
    # shared tables actually shrink multi-strip files (the tag is real)
    full = mc.encode_tiff(img, compression="jpeg", quality=100, rows_per_strip=2)
    shared = mc.encode_tiff(img, compression="jpeg", quality=100,
                            rows_per_strip=2, shared_jpeg_tables=True)
    assert len(shared) < len(full)


def test_tiff_jpeg_lossy_roundtrip_fidelity():
    """Non-constant content through JPEG strips is lossy: gate on PSNR
    like the standalone JPEG tests, across a strip boundary."""
    h, w = 24, 31
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [yy * 255 / h, xx * 255 / w, (yy + xx) * 255 / (h + w)], axis=-1
    ).astype(np.uint8)
    for shared in (False, True):
        blob = mc.encode_tiff(img, compression="jpeg", quality=92,
                              rows_per_strip=10, shared_jpeg_tables=shared)
        out, _ = mc.decode_tiff(blob)
        assert out.shape == (h, w, 3)
        assert _psnr(img, out) > 38.0


def test_tiff_jpeg_photometric_drives_color_space():
    """TechNote 2: PhotometricInterpretation, not the JPEG stream, declares
    the component space. Patching the tag 6→2 on a color JPEG-TIFF must
    yield the UNtransformed component planes (identical to decode_jpeg with
    rgb_transform=False on the strip stream)."""
    import struct as _s

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 12, 3), dtype=np.uint8)
    blob = bytearray(mc.encode_tiff(img, compression="jpeg", quality=95))
    (ifd_off,) = _s.unpack("<I", bytes(blob[4:8]))
    (n,) = _s.unpack("<H", bytes(blob[ifd_off : ifd_off + 2]))
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ = _s.unpack("<HH", bytes(blob[e : e + 4]))
        if tag == 262:
            assert _s.unpack("<H", bytes(blob[e + 8 : e + 10]))[0] == 6
            blob[e + 8 : e + 10] = _s.pack("<H", 2)
        if tag == 273:
            (strip_off,) = _s.unpack("<I", bytes(blob[e + 8 : e + 12]))
        if tag == 279:
            (strip_cnt,) = _s.unpack("<I", bytes(blob[e + 8 : e + 12]))
    out2, _ = mc.decode_tiff(bytes(blob))
    raw_planes, _ = mc.decode_jpeg(
        bytes(blob[strip_off : strip_off + strip_cnt]), rgb_transform=False
    )
    assert np.array_equal(out2, raw_planes)
    assert not np.array_equal(out2, mc.decode_tiff(
        mc.encode_tiff(img, compression="jpeg", quality=95))[0])


def test_tiff_jpeg_malformed_tables_and_strips_raise():
    """Contract errors for the comp-7 entry points: a JPEGTables payload
    that is not an SOI…EOI stream, a strip without SOI, and a strip whose
    decoded dimensions contradict the IFD all raise MediaDecodeError."""
    import struct as _s

    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    blob = bytearray(mc.encode_tiff(img, compression="jpeg", quality=100,
                                    rows_per_strip=4, shared_jpeg_tables=True))
    (ifd_off,) = _s.unpack("<I", bytes(blob[4:8]))
    (n,) = _s.unpack("<H", bytes(blob[ifd_off : ifd_off + 2]))
    locs = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        (tag,) = _s.unpack("<H", bytes(blob[e : e + 2]))
        locs[tag] = e
    # corrupt the JPEGTables SOI
    (jt_off,) = _s.unpack("<I", bytes(blob[locs[347] + 8 : locs[347] + 12]))
    bad = bytearray(blob)
    bad[jt_off : jt_off + 2] = b"\x00\x00"
    with pytest.raises(mc.MediaDecodeError, match="JPEGTables"):
        mc.decode_tiff(bytes(bad))
    # corrupt a strip's SOI
    (offs_ptr,) = _s.unpack("<I", bytes(blob[locs[273] + 8 : locs[273] + 12]))
    (s0,) = _s.unpack("<I", bytes(blob[offs_ptr : offs_ptr + 4]))
    bad = bytearray(blob)
    bad[s0 : s0 + 2] = b"\x00\x00"
    with pytest.raises(mc.MediaDecodeError, match="missing SOI"):
        mc.decode_tiff(bytes(bad))
    # declared width EXCEEDS the strip JPEG's SOF width: underfull strip
    # data must raise (a narrower declaration merely crops — the padding
    # tolerance tiles need)
    bad = bytearray(blob)
    bad[locs[256] + 8 : locs[256] + 12] = _s.pack("<I", 100)
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_tiff(bytes(bad))
    narrower = bytearray(blob)
    narrower[locs[256] + 8 : locs[256] + 12] = _s.pack("<I", 6)
    out, _ = mc.decode_tiff(bytes(narrower))
    assert out.shape[1] == 6  # cropped, not rejected


def test_jpeg_zero_sampling_factor_rejected():
    """Fuzz-found while landing comp-7: a forged SOF component with h or v
    sampling factor 0 reached max()/divmod as a ZeroDivisionError — a
    foreign exception leaking through the contract. T.81 B.2.2 bounds the
    factors to 1..4; out-of-range now raises the contract error (and
    _clean_errors wraps ZeroDivisionError as defense in depth)."""
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    blob = bytearray(mc.encode_jpeg(img, quality=90))
    sof = blob.find(b"\xFF\xC0")
    assert sof > 0
    # component 0's h/v byte sits at SOF body offset 6+1 (after marker+len)
    blob[sof + 4 + 6 + 1] = 0x00
    with pytest.raises(mc.MediaDecodeError, match="sampling factors"):
        mc.decode_jpeg(bytes(blob))


def test_tiff_jpeg_fuzz_fails_cleanly():
    """The repo-wide parser-hardening bar for the comp-7 paths: mutated
    JPEG-TIFFs (both plain and shared-JPEGTables flavors) must decode or
    raise MediaDecodeError/NotImplementedError — never hang, alloc-bomb,
    or leak a foreign exception. 800-trial regression net (a 4000-trial
    sweep ran clean when this landed)."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (14, 11, 3), dtype=np.uint8)
    bases = [
        bytearray(mc.encode_tiff(img, compression="jpeg", quality=90,
                                 rows_per_strip=6, shared_jpeg_tables=sh))
        for sh in (False, True)
    ]
    for trial in range(800):
        blob = bytearray(bases[trial % 2])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(8, len(blob))]
        try:
            mc.decode_tiff(bytes(blob))
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_roundtrip_smooth_gradient(subsample):
    """JPEG is lossy, so the gate is fidelity (PSNR), not bit equality —
    a smooth gradient at quality 92 must reconstruct above 40 dB."""
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [yy * 255 / h, xx * 255 / w, (yy + xx) * 255 / (h + w)], axis=-1
    ).astype(np.uint8)
    dec, meta = mc.decode_jpeg(mc.encode_jpeg(img, quality=92, subsample=subsample))
    assert dec.shape == (h, w, 3)
    assert (meta["height"], meta["width"], meta["n_channels"]) == (h, w, 3)
    assert _psnr(img, dec) > 40.0


def test_jpeg_grayscale_and_nonaligned_dims():
    """Single-component scan + dimensions that don't fall on the 8x8 (or
    16x16 for 4:2:0) MCU grid exercise the pad-and-crop path."""
    yy, xx = np.mgrid[0:17, 0:23]
    g = (128 + 100 * np.sin(yy / 4.0) * np.cos(xx / 5.0)).astype(np.uint8)
    dec, meta = mc.decode_jpeg(mc.encode_jpeg(g, quality=90))
    assert dec.shape == (17, 23, 1) and meta["n_channels"] == 1
    assert _psnr(g[:, :, None], dec) > 38.0
    rgb = np.dstack([g, g[::-1], g[:, ::-1]])
    dec3, _ = mc.decode_jpeg(mc.encode_jpeg(rgb, quality=95, subsample="4:2:0"))
    assert dec3.shape == (17, 23, 3)
    assert _psnr(rgb, dec3) > 28.0  # chroma at quarter resolution


def test_jpeg_quality100_constant_blocks_bit_exact():
    """At quality=100 the Annex-K tables scale to all-ones, so a constant
    image is DC-only with exact integer coefficients: the decode must be
    bit-identical for every shade — the property the multimodal oracle
    relies on."""
    for shade in (0, 1, 97, 128, 250, 255):
        img = np.full((5, 9, 3), shade, dtype=np.uint8)
        for sub in ("4:4:4", "4:2:0"):
            dec, _ = mc.decode_jpeg(mc.encode_jpeg(img, quality=100, subsample=sub))
            assert np.array_equal(dec, img), (shade, sub)


def test_jpeg_restart_markers():
    """DRI + RSTn segmentation with DC predictor resets must reproduce the
    same pixels as the unsegmented stream."""
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [yy * 255 / h, xx * 255 / w, (yy * xx) % 256], axis=-1
    ).astype(np.uint8)
    base, _ = mc.decode_jpeg(mc.encode_jpeg(img, quality=85, subsample="4:2:0"))
    for ri in (1, 3):
        seg, _ = mc.decode_jpeg(
            mc.encode_jpeg(img, quality=85, subsample="4:2:0", restart_interval=ri)
        )
        assert np.array_equal(seg, base)


def test_jpeg_dispatch_and_unsupported_sof_raises():
    img = RNG.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    blob = mc.encode_jpeg(img, quality=90)
    dec, meta = mc.decode_image(blob)
    assert meta["format"] == "jpeg" and dec.shape == (9, 11, 3)
    # flip SOF0 (FFC0) to SOF3 (lossless sequential): must raise named
    idx = blob.index(b"\xFF\xC0")
    hacked = blob[:idx] + b"\xFF\xC3" + blob[idx + 2 :]
    with pytest.raises(NotImplementedError, match="SOF3"):
        mc.decode_jpeg(hacked)
    # SOF2 alone (baseline scan layout under a progressive frame header)
    # is no longer a named seam — it decodes or raises the contract error
    hacked2 = blob[:idx] + b"\xFF\xC2" + blob[idx + 2 :]
    try:
        mc.decode_jpeg(hacked2)
    except mc.MediaDecodeError:
        pass


def test_jpeg_progressive_bit_identical_to_baseline():
    """The progressive scan script (DC first Al=1 → AC first Al=1 → DC
    refine → AC refine) delivers every coefficient bit, so decode must be
    BIT-IDENTICAL to decoding the baseline encoding of the same input —
    the entropy layer is the only difference. This pins encoder and
    decoder against each other through an independently-validated path
    (the baseline decoder has its own external vectors)."""
    rng = np.random.RandomState(5)
    cases = [
        ((np.mgrid[0:17, 0:23][0] * 11 % 256).astype(np.uint8), {}),
        (rng.randint(0, 256, (24, 31, 3), np.uint8), {}),
        (rng.randint(0, 256, (21, 19, 3), np.uint8), {"subsample": "4:2:0"}),
        (rng.randint(0, 256, (16, 24, 3), np.uint8), {"subsample": "4:2:2"}),
        (np.full((9, 7, 3), 163, np.uint8), {"quality": 100}),
    ]
    for img, kw in cases:
        d_base, _ = mc.decode_jpeg(mc.encode_jpeg(img, **kw))
        d_prog, meta = mc.decode_jpeg(mc.encode_jpeg(img, progressive=True, **kw))
        assert np.array_equal(d_base, d_prog), kw
        assert meta["height"] == img.shape[0]


def test_jpeg_progressive_quality100_constant_bit_exact():
    """quality=100 constant rasters stay bit-exact through the progressive
    path — the analytic-oracle property the multimodal catalog rotation
    relies on (same argument as the baseline q100 test)."""
    for shade in (0, 97, 255):
        img = np.full((6, 10, 3), shade, dtype=np.uint8)
        dec, _ = mc.decode_jpeg(mc.encode_jpeg(img, quality=100, progressive=True))
        assert np.array_equal(dec, img), shade
    g = np.full((7, 5), 42, dtype=np.uint8)
    dec, meta = mc.decode_jpeg(mc.encode_jpeg(g, quality=100, progressive=True))
    assert np.array_equal(dec[:, :, 0], g) and meta["n_channels"] == 1


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.sampled_from([1, 3]),
    st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    st.integers(min_value=70, max_value=100),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_progressive_bit_identity_property(h, w, c, sub, quality, seed):
    """Property form of the bit-identity anchor: for ANY image, dims,
    subsampling, and quality, decoding the progressive encoding equals
    decoding the baseline encoding bit-for-bit (the scan script delivers
    every coefficient bit; only the entropy layer differs)."""
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
    if c == 1:
        img = img[:, :, 0]
    kw = {"quality": quality, "subsample": sub} if c == 3 else {"quality": quality}
    a, _ = mc.decode_jpeg(mc.encode_jpeg(img, **kw))
    b, _ = mc.decode_jpeg(mc.encode_jpeg(img, progressive=True, **kw))
    assert np.array_equal(a, b)


def test_jpeg_duplicate_sof_rejected():
    """T.81 B.2.1: one frame header per stream. A forged SECOND SOF after
    the first would re-declare dimensions after the progressive
    coefficient store was sized (array shape contradicting meta, or a
    multi-GiB plane allocation from forged dims) — round-12 code-review
    catch, reproduced before the fix."""
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    for progressive in (False, True):
        blob = bytearray(mc.encode_jpeg(img, quality=90, progressive=progressive))
        sof_marker = b"\xFF\xC2" if progressive else b"\xFF\xC0"
        idx = blob.find(sof_marker)
        (ln,) = __import__("struct").unpack(">H", bytes(blob[idx + 2 : idx + 4]))
        seg = bytes(blob[idx : idx + 2 + ln])
        forged = bytearray(seg)
        forged[5:9] = (333).to_bytes(2, "big") + (444).to_bytes(2, "big")
        hacked = bytes(blob[: idx + 2 + ln]) + bytes(forged) + bytes(blob[idx + 2 + ln :])
        with pytest.raises(mc.MediaDecodeError, match="duplicate SOF"):
            mc.decode_jpeg(hacked)


def test_jpeg_progressive_fuzz_fails_cleanly():
    """Parser-hardening bar for the SOF2 paths: mutated progressive
    streams decode or raise the contract error — never hang, alloc-bomb,
    or leak a foreign exception. 800-trial regression net (an 8000-trial
    sweep ran clean when this landed)."""
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (18, 15, 3), dtype=np.uint8)
    bases = [
        bytearray(mc.encode_jpeg(img, quality=85, progressive=True)),
        bytearray(mc.encode_jpeg(img, quality=85, subsample="4:2:0", progressive=True)),
    ]
    for trial in range(800):
        blob = bytearray(bases[trial % 2])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(4, len(blob))]
        try:
            mc.decode_jpeg(bytes(blob))
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def test_jpeg_rejects_garbage():
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_jpeg(b"\xFF\xD8\xFF\xEE" + b"\x00" * 8)
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_jpeg(b"NOTAJPEG")


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
    st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, subsample, seed):
    """Arbitrary sizes (including 1xN edge strips) survive the encode →
    decode chain structurally, and low-frequency content stays faithful."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (-(-h // 8), -(-w // 8), 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w]  # blocky = low freq
    dec, meta = mc.decode_jpeg(mc.encode_jpeg(img, quality=95, subsample=subsample))
    assert dec.shape == (h, w, 3)
    assert (meta["height"], meta["width"]) == (h, w)
    assert _psnr(img, dec) > 25.0


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_animation_roundtrip_property(n_frames, h, w, seed):
    """Animated GIF: all frames decode bit-exactly in order, with delays
    and duration surfaced in meta."""
    rng = np.random.RandomState(seed)
    frames = (rng.randint(0, 6, (n_frames, h, w, 3)) * 40).astype(np.uint8)
    blob = mc.encode_gif_animation(frames, delay_cs=5)
    out, meta = mc.decode_gif_frames(blob)
    assert np.array_equal(out, frames)
    assert meta["n_frames"] == n_frames
    assert meta["frame_delays_cs"] == [5] * n_frames
    assert meta["duration_ms"] == n_frames * 50


def test_gif_frames_composites_partial_blocks():
    """A frame drawn at an offset composites over the previous canvas —
    the disposal-none rule decode_gif_frames implements."""
    f0 = np.full((6, 6, 3), 10, dtype=np.uint8)
    blob = bytearray(mc.encode_gif_animation(f0[None]))
    # append a second 2x2 image block at (2,2) drawn with palette color 0
    # by hand: reuse the single-color encoder at a sub-rectangle
    patch = np.full((2, 2), 0, dtype=np.uint8)
    payload = mc._gif_lzw_encode(patch, 2)
    block = bytearray(b"\x2c" + struct.pack("<HHHHB", 2, 2, 2, 2, 0))
    block.append(2)
    for i in range(0, len(payload), 255):
        c = payload[i : i + 255]
        block.append(len(c))
        block += c
    block.append(0)
    assert blob[-1] == 0x3B
    blob[-1:] = bytes(block) + b"\x3b"
    frames, meta = mc.decode_gif_frames(bytes(blob))
    assert meta["n_frames"] == 2
    assert np.array_equal(frames[0], f0)
    expect = f0.copy()
    expect[2:4, 2:4] = 10  # palette color 0 is the single color 10
    assert np.array_equal(frames[1], expect)


def test_sample_frames_on_spark(spark):
    """sample_frames: per-row fan-out, every_n stride, and per-row failure
    isolation through the Arrow kernel."""
    from zarr_climate_etl_ipfs_spark.multimodal import sample_frames

    frames = np.stack([np.full((3, 4, 3), s, dtype=np.uint8) for s in (10, 20, 30, 40, 50)])
    good = mc.encode_gif_animation(frames)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a gif"))],
        "doc_id long, content binary",
    )
    rows = sample_frames(df, every_n=2).orderBy("doc_id", "frame_idx").collect()
    ok = [r for r in rows if r["decode_ok"]]
    bad = [r for r in rows if not r["decode_ok"]]
    assert [(r["frame_idx"], r["f_mean"]) for r in ok] == [(0, 10.0), (2, 30.0), (4, 50.0)]
    assert all((r["f_height"], r["f_width"]) == (3, 4) for r in ok)
    assert len(bad) == 1 and bad[0]["doc_id"] == 2 and "GIF" in bad[0]["error"]


def test_resize_images_on_spark(spark):
    """resize_images: real decode → box resize → PNG re-encode, mixed
    formats, failure isolation; the resized PNG is itself decodable."""
    from zarr_climate_etl_ipfs_spark.multimodal import resize_images

    grad = np.repeat(np.arange(8, dtype=np.uint8)[:, None] * 30, 8, axis=1)
    img = np.dstack([grad, grad, grad])
    rows = [
        (1, bytearray(mc.encode_png(img))),
        (2, bytearray(mc.encode_tiff(img))),
        (3, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert got[1]["decode_ok"] and got[2]["decode_ok"] and not got[3]["decode_ok"]
    assert (got[1]["in_h"], got[1]["out_h"], got[1]["out_w"]) == (8, 4, 4)
    # identical pixels via two containers → identical resized bytes
    assert bytes(got[1]["resized_png"]) == bytes(got[2]["resized_png"])
    dec, _ = mc.decode_png(bytes(got[1]["resized_png"]))
    assert dec.shape == (4, 4, 3)
    # 2x2 box means of the row gradient: rows (0,30),(60,90),(120,150),(180,210)
    assert list(dec[:, 0, 0]) == [15, 75, 135, 195]


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=3000),
    st.integers(min_value=1, max_value=2),
    st.sampled_from(["smooth", "noise", "const", "ramp"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_flac_roundtrip_property(n, ch, kind, seed):
    """FLAC is lossless: decode(encode(x)) equals x on the int16 lattice for
    every signal class (each exercising a different subframe type)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float32)
    if kind == "smooth":
        base = np.sin(2 * np.pi * t / 50.0) * 0.7
    elif kind == "noise":
        base = rng.uniform(-0.95, 0.95, n)
    elif kind == "const":
        base = np.full(n, rng.uniform(-0.9, 0.9))
    else:
        base = (t / max(n, 1)) * 1.8 - 0.9
    x = np.stack([base.astype(np.float32)] * ch, axis=1) * (1 if ch == 1 else np.array([1, -0.5], dtype=np.float32)[:ch])
    dec, meta = mc.decode_flac(mc.encode_flac(x, sample_rate=16000, block_size=576))
    q = np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0
    assert dec.shape == (n, ch)
    assert np.abs(dec - q).max() == 0.0
    assert meta["sample_rate"] == 16000 and meta["n_channels"] == ch


def test_flac_compresses_smooth_audio():
    t = np.arange(8000, dtype=np.float32) / 16000
    sig = (np.sin(2 * np.pi * 220 * t) * 0.7).astype(np.float32)
    blob = mc.encode_flac(sig, sample_rate=16000)
    assert len(blob) < 0.8 * sig.size * 2  # beats raw PCM
    wav = mc.encode_wav(sig, sample_rate=16000)
    fa = mc.audio_features(blob, {})
    fw = mc.audio_features(wav, {})
    assert np.allclose(fa, fw)  # same samples through either container


def test_audio_dispatch_and_flac_garbage():
    with pytest.raises(NotImplementedError, match="MP3"):
        mc.decode_audio(b"ID3\x04\x00rest")
    with pytest.raises(NotImplementedError, match="Ogg"):
        mc.decode_audio(b"OggS\x00rest")
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_audio(b"randombytes")
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_flac(b"fLaC" + b"\x00\x00\x00\x01\x00")


def _flac_stream(body_writer, nch=1, bps=16, rate=16000, blocksize=8, total=8):
    """Hand-assemble a minimal FLAC stream around one frame whose subframe
    bits come from body_writer(bw) — covers decoder paths the repo encoder
    never emits (LPC, mid/side)."""
    si = mc._FlacBitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(nch - 1, 3); si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    out = bytearray(b"fLaC")
    meta = bytes(si.out) + b"\x00" * 16
    out += bytes([0x80]) + len(meta).to_bytes(3, "big") + meta
    hw = mc._FlacBitWriter()
    hw.write(0x3FFE, 14); hw.write(0, 1); hw.write(0, 1)
    hw.write(7, 4)           # 16-bit blocksize-1 follows
    hw.write(5, 4)           # 16 kHz
    hw.write(10 if nch == 2 else nch - 1, 4)  # mid/side for stereo
    hw.write(4, 3)           # 16 bps
    hw.write(0, 1)
    hw.align()
    header = bytes(hw.out) + mc._flac_utf8_encode(0) + struct.pack(">H", blocksize - 1)
    header += bytes([mc._crc8(header)])
    bw = mc._FlacBitWriter()
    body_writer(bw)
    bw.align()
    frame = header + bytes(bw.out)
    frame += struct.pack(">H", mc._crc16(frame))
    return bytes(out + frame)


def test_flac_lpc_subframe_decodes():
    """LPC order-2 subframe: warmup [100, 110], coefs [5, -2] at shift 2,
    residuals rice(param=3) — decoder must reproduce pred = (5a-2b)>>2 + r."""
    warm = [100, 110]
    coefs = [5, -2]
    shift = 2
    resid = [3, -1, 0, 7, -4, 2]
    expect = list(warm)
    for r in resid:
        expect.append(((coefs[0] * expect[-1] + coefs[1] * expect[-2]) >> shift) + r)

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + (2 - 1), 6)   # LPC order 2
        bw.write(0, 1)              # no wasted bits
        for w in warm:
            bw.write_signed(w, 16)
        bw.write(4, 4)              # precision-1 → 5 bits
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, 5)
        bw.write(0, 2)              # 4-bit rice
        bw.write(0, 4)              # partition order 0
        bw.write(3, 4)              # rice param 3
        for r in resid:
            z = (abs(r) << 1) - (1 if r < 0 else 0)
            bw.write_unary(z >> 3)
            bw.write(z & 7, 3)

    samples, meta = mc.decode_flac(_flac_stream(body))
    got = [int(round(v * 32768)) for v in samples[:, 0]]
    assert got == expect
    assert meta["bits_per_sample"] == 16


def test_flac_mid_side_decodes():
    """Mid/side stereo: two VERBATIM subframes (side at bps+1) must invert
    to the original left/right exactly, including odd mid rounding."""
    left = [100, -50, 32767, -32768, 7, 0, 255, -1]
    right = [90, -60, 32760, -32768, -7, 1, 250, -2]
    mids = [(l + r) >> 1 for l, r in zip(left, right)]
    sides = [l - r for l, r in zip(left, right)]

    def body(bw):
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)   # VERBATIM mid
        for m in mids:
            bw.write_signed(m, 16)
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)   # VERBATIM side, 17 bit
        for s in sides:
            bw.write_signed(s, 17)

    samples, meta = mc.decode_flac(_flac_stream(body, nch=2))
    got_l = [int(round(v * 32768)) for v in samples[:, 0]]
    got_r = [int(round(v * 32768)) for v in samples[:, 1]]
    assert got_l == left and got_r == right
    assert meta["n_channels"] == 2


@settings(max_examples=120, deadline=None)
@given(
    st.sampled_from([
        b"\xff\xd8\xff\xe0", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"II*\x00",
        b"MM\x00*", b"P6\n", b"BM", b"RIFF\x10\x00\x00\x00WAVE", b"fLaC",
    ]),
    st.binary(min_size=0, max_size=300),
)
def test_decoders_fail_cleanly_on_fuzzed_bytes(magic, tail):
    """Adversarial-input taxonomy: every decoder entry point raises ONLY
    MediaDecodeError (or NotImplementedError for external formats) on
    corrupt payloads — no struct/zlib/Index errors may leak from a 100 TB
    crawl corpus into the Spark stage."""
    blob = magic + tail
    for dec in (mc.decode_image, mc.decode_audio):
        try:
            dec(blob)
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def test_tiff_two_channel_inline_bps_roundtrip():
    """TIFF spec: tag values that fit 4 bytes are stored inline — the c=2
    bits_per_sample pair must round-trip (regression: it was written as an
    offset, producing unreadable gray+alpha files)."""
    img = RNG.randint(0, 256, (6, 5, 2), dtype=np.uint8)
    for be in (False, True):
        out, meta = mc.decode_tiff(mc.encode_tiff(img, big_endian=be))
        assert np.array_equal(out, img) and meta["channels"] == 2


def test_tiff_white_is_zero_inverts():
    """PhotometricInterpretation=0 (WhiteIsZero) grayscale inverts on
    decode so 0 always means black downstream."""
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    blob = bytearray(mc.encode_tiff(img))
    idx = blob.index(struct.pack("<HHI", 262, 3, 1))
    assert blob[idx + 8] == 1  # encoder writes BlackIsZero
    blob[idx + 8] = 0
    out, _ = mc.decode_tiff(bytes(blob))
    assert np.array_equal(out[:, :, 0], 255 - img)


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: 0xFF fill bytes may pad any marker — the decoder must
    skip them (regression: the pad byte was read as a marker id)."""
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    blob = mc.encode_jpeg(img, quality=100)
    i = blob.index(b"\xFF\xDA")
    dec, _ = mc.decode_jpeg(blob[:i] + b"\xFF\xFF\xFF" + blob[i:])
    assert np.array_equal(dec, img)


def test_gif_lzw_bomb_capped():
    """A GIF declaring tiny dimensions but carrying a high-expansion LZW
    stream must raise (bounded allocation), not expand unbounded."""
    big = mc.encode_gif(np.zeros((64, 64, 3), dtype=np.uint8))
    hacked = bytearray(big)
    hacked[6:10] = struct.pack("<HH", 2, 2)
    k = hacked.index(b"\x2c")
    hacked[k + 5 : k + 9] = struct.pack("<HH", 2, 2)
    with pytest.raises(mc.MediaDecodeError, match="exceeds declared size"):
        mc.decode_gif(bytes(hacked))


def _splice_frames(encoded: bytes, n_extra: int) -> bytes:
    """Duplicate a single-frame GIF's image block n_extra times before the
    trailer (all frames identical; disposal 'none' makes this spec-legal)."""
    buf = bytearray(encoded)
    body_start = buf.index(0x2C)
    frame = bytes(buf[body_start:-1])
    return bytes(buf[:-1]) + frame * n_extra + b"\x3b"


def test_gif_decode_gif_skips_frames_past_first():
    """decode_gif(max_frames=1 path): a multi-frame GIF decodes only frame 1
    (structural skip for the rest) yet still reports the true n_frames."""
    img = np.full((6, 7, 3), 0, dtype=np.uint8)
    multi = _splice_frames(mc.encode_gif(img), 5)
    out, meta = mc.decode_gif(multi)
    assert np.array_equal(out, img)
    assert meta["n_frames"] == 6
    # frames API with an explicit cap: one decoded frame, full count + delays
    frames, fmeta = mc.decode_gif_frames(multi, max_frames=1)
    assert frames.shape[0] == 1
    assert fmeta["n_frames"] == 6
    assert len(fmeta["frame_delays_cs"]) == 6


def test_gif_canvas_bomb_capped(monkeypatch):
    """Many frames x large logical screen must hit the total-canvas-bytes
    cap instead of allocating one full canvas copy per frame unbounded."""
    monkeypatch.setattr(mc, "_GIF_MAX_CANVAS_BYTES", 1 << 20)
    blob = bytearray(mc.encode_gif(np.zeros((1, 1, 3), dtype=np.uint8)))
    blob[6:10] = struct.pack("<HH", 200, 200)  # 120 KB canvas, 10 frames > 1 MiB
    bomb = _splice_frames(bytes(blob), 9)
    with pytest.raises(mc.MediaDecodeError, match="canvas-bytes cap"):
        mc.decode_gif_frames(bomb)
    # decode_gif (first frame only) stays under the cap for the same input
    out, meta = mc.decode_gif(bomb)
    assert out.shape == (200, 200, 3)
    assert meta["n_frames"] == 10


def test_flac_sample_bomb_capped():
    """Appended CONSTANT frames past STREAMINFO total must raise (bounded
    Python-int accumulation), not allocate without limit."""
    blob = mc.encode_flac(np.zeros(4096 * 2, dtype=np.float32))
    fstart = blob.index(b"\xff\xf8")
    frames = blob[fstart:]
    bomb = blob + frames * 10  # 90,112 samples vs cap total+65536 = 73,728
    with pytest.raises(mc.MediaDecodeError, match="exceed cap"):
        mc.decode_flac(bomb)
    # the unmodified stream still decodes
    out, meta = mc.decode_flac(blob)
    assert out.shape == (8192, 1)


def test_jpeg_mcu_bomb_rejected():
    """A tiny file whose SOF declares 65535x65535 must be rejected before
    the MCU loop (the bit reader zero-pads forever on truncated data)."""
    blob = bytearray(mc.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = blob.index(b"\xff\xc0")
    struct.pack_into(">HH", blob, i + 5, 65535, 65535)
    with pytest.raises(mc.MediaDecodeError, match="entropy data"):
        mc.decode_jpeg(bytes(blob))


def test_mp4_probe_variants():
    """Box-walk probe: 64-bit largesize boxes, v1 mvhd, multiple tracks,
    and rejection of ftyp-less / truncated-box input."""
    blob = mc.encode_mp4_meta(1920, 1080, 90000, track_types=("vide", "soun", "soun"))
    m = mc.probe_mp4(blob)
    assert (m["width"], m["height"], m["duration_ms"], m["n_tracks"]) == (1920, 1080, 90000, 3)
    assert m["track_types"] == ["vide", "soun", "soun"]
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_mp4(b"\x00\x00\x00\x08free" + b"\x00" * 8)
    hacked = bytearray(blob)
    i = hacked.index(b"moov")
    struct.pack_into(">I", hacked, i - 4, 0xFFFFFF)  # box overruns file
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_mp4(bytes(hacked))


def test_ogg_probe_vorbis_and_opus():
    v = mc.probe_ogg(mc.encode_ogg_meta("vorbis", 48000, 2, 96000))
    assert (v["codec"], v["n_channels"], v["sample_rate"], v["duration_ms"]) == (
        "vorbis", 2, 48000, 2000)
    o = mc.probe_ogg(mc.encode_ogg_meta("opus", 8000, 1, 8000))
    assert (o["codec"], o["duration_ms"]) == ("opus", 1000)
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_ogg(b"OggS" + b"\x00" * 10)  # truncated header
    with pytest.raises(mc.MediaDecodeError):
        # well-formed page whose first packet is neither Vorbis nor Opus
        bad = bytearray(mc.encode_ogg_meta("vorbis", 48000, 2, 96000))
        bad[28:35] = b"\x01nothin"
        mc.probe_ogg(bytes(bad))


def test_probe_media_dispatch():
    """probe_media answers for every container family: structure-only for
    MP4/Ogg, decoder meta for WAV/FLAC/images."""
    assert mc.probe_media(mc.encode_mp4_meta(64, 64, 500))["format"] == "mp4"
    assert mc.probe_media(mc.encode_ogg_meta("opus", 16000, 1, 1600))["format"] == "ogg"
    wav = mc.encode_wav(np.zeros((160, 2), dtype=np.float32), sample_rate=16000)
    wm = mc.probe_media(wav)
    assert (wm["n_channels"], wm["sample_rate"]) == (2, 16000)
    img = mc.probe_media(mc.encode_png(np.zeros((5, 9, 3), np.uint8)))
    assert (img["height"], img["width"]) == (5, 9)


def test_probe_fuzz_never_leaks():
    """Bit-flipped container skeletons must raise MediaDecodeError, never
    struct.error/IndexError."""
    rng = np.random.RandomState(5)
    for base in (mc.encode_mp4_meta(320, 240, 7000), mc.encode_ogg_meta("vorbis", 44100, 2, 44100)):
        for _ in range(40):
            hacked = bytearray(base)
            for _ in range(2):
                hacked[rng.randint(4, len(base))] ^= 1 << rng.randint(0, 8)
            try:
                mc.probe_media(bytes(hacked))
            except (mc.MediaDecodeError, NotImplementedError):
                pass


def test_mp3_probe_and_dispatch():
    """Layer-III frame walk: ID3v2 skip, MPEG1/MPEG2 frame sizes, mono
    detection, exact sample-count duration; dispatch must not shadow
    JPEG (0xFFD8 fails the 0xFFE sync mask)."""
    m = mc.probe_media(mc.encode_mp3_meta(38, 44100, 128))
    assert (m["format"], m["n_frames"], m["n_channels"]) == ("mp3", 38, 2)
    assert m["duration_ms"] == 38 * 1152 * 1000 // 44100
    m2 = mc.probe_mp3(mc.encode_mp3_meta(10, 22050, 64, mono=True))
    assert (m2["n_channels"], m2["duration_ms"]) == (1, 10 * 576 * 1000 // 22050)
    jpg = mc.encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    assert mc.probe_media(jpg)["format"] == "jpeg"
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_mp3(b"\xff\xe0\x00\x00")  # reserved version bits
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00garbage")


def test_mp4_largesize_smaller_than_header_rejected():
    """A largesize (size==1) box header is 16 bytes; a declared 64-bit size
    of 8..15 would place the body past the box end so leaf parsers read the
    next box's bytes as metadata (round-8 advisor catch) — must reject."""
    # moov box containing one largesize box claiming size=12 (< 16-byte
    # header) of type mvhd, followed by trailing bytes it would misread
    ftyp = struct.pack(">I4s4sI", 16, b"ftyp", b"isom", 0)
    inner = struct.pack(">I4sQ", 1, b"mvhd", 12) + b"\x00" * 32
    moov = struct.pack(">I4s", 8 + len(inner), b"moov") + inner
    with pytest.raises(mc.MediaDecodeError, match="bad box size"):
        mc.probe_mp4(ftyp + moov)


def test_mp4_truncated_largesize_header_rejected():
    """size==1 with fewer than 16 bytes remaining must raise a clean
    decode error, not struct.error."""
    ftyp = struct.pack(">I4s4sI", 16, b"ftyp", b"isom", 0)
    blob = ftyp + struct.pack(">I4s", 1, b"moov") + b"\x00\x00"
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_mp4(blob)


# -- real-encoder golden fixtures (tests/fixtures/real/, round-8 ask #8) -----

_REAL = Path(__file__).parent / "fixtures" / "real"


def test_real_lame_mp3_probe_golden():
    """A real LAME 3.98.2 file: ID3v2.4 syncsafe tag skip, MPEG-2
    Layer-III frame walk, mono mode bits — values pinned exactly (they
    came from the file's actual structure, verified against the LAME
    header fields)."""
    m = mc.probe_mp3((_REAL / "lame_22k_mono.mp3").read_bytes())
    assert m == {
        "format": "mp3",
        "n_frames": 45,
        "sample_rate": 22050,
        "n_channels": 1,
        "duration_ms": 1175,
    }
    # and the container sniffer routes the ID3-prefixed blob to mp3
    assert mc.probe_media((_REAL / "lame_22k_mono.mp3").read_bytes())["format"] == "mp3"


def test_audio_decoder_injection_seam():
    """MP3/Ogg injection seam (r13 decision record): a user with
    ffmpeg/miniaudio passes decoder= and gets samples + features where
    the bare call raises the named error; a contract-violating plugin
    fails cleanly. The payload is the REAL LAME file, so the seam is
    exercised with the bytes a production pipeline would route here."""
    raw = (_REAL / "lame_22k_mono.mp3").read_bytes()
    with pytest.raises(NotImplementedError, match="decoder="):
        mc.decode_audio(raw)
    calls = []

    def fake(content, fmt):
        calls.append(fmt)
        assert content is raw
        t = np.arange(2205, dtype=np.float32) / 22050.0
        return np.sin(2 * np.pi * 440 * t).reshape(-1, 1), {"sample_rate": 22050}

    samples, meta = mc.decode_audio(raw, decoder=fake)
    assert calls == ["mp3"]
    assert samples.shape == (2205, 1) and samples.dtype == np.float32
    assert meta["format"] == "mp3" and meta["duration_ms"] == 100
    feats = mc.audio_features(raw, {}, decoder=fake)
    assert feats.shape == (8,) and feats[2] == 22050
    # Ogg routes through the same seam
    with pytest.raises(NotImplementedError, match="decoder="):
        mc.decode_audio(b"OggS" + bytes(32))
    s2, m2 = mc.decode_audio(b"OggS" + bytes(32), decoder=lambda c, f: (np.zeros((4, 2)), {"sample_rate": 8000}))
    assert m2["format"] == "ogg" and s2.shape == (4, 2)
    # contract violations surface as MediaDecodeError, not numpy blowups
    with pytest.raises(mc.MediaDecodeError, match="ndim"):
        mc.decode_audio(raw, decoder=lambda c, f: (np.zeros(7), {"sample_rate": 1}))
    with pytest.raises(mc.MediaDecodeError, match="sample_rate"):
        mc.decode_audio(raw, decoder=lambda c, f: (np.zeros((4, 1)), {}))


def test_real_gif_decode_golden():
    """A real-encoder GIF (gsutil test data): extension blocks and real
    palette ordering, not this repo's encode_gif output."""
    arr, meta = mc.decode_gif((_REAL / "gsutil_8x8.gif").read_bytes())
    assert arr.shape == (8, 8, 3)
    assert (meta["height"], meta["width"], meta["n_frames"]) == (8, 8, 1)


def test_real_wav_cross_depth_consistency():
    """The same recorded guitar pluck at 8- and 16-bit PCM (CPython test
    audio): both must decode to the same sample/channel geometry, and the
    8-bit waveform must track the 16-bit one within quantization error —
    a cross-depth contract no synthesized fixture exercises."""
    a16, m16 = mc.decode_wav((_REAL / "pluck-pcm16.wav").read_bytes())
    a8, m8 = mc.decode_wav((_REAL / "pluck-pcm8.wav").read_bytes())
    assert m16 == {
        "format": "wav",
        "n_channels": 2,
        "sample_rate": 11025,
        "duration_ms": 299,
    }
    assert a16.shape == a8.shape == (3307, 2)
    assert m8["sample_rate"] == 11025
    # 8-bit quantization step is 1/128 ≈ 0.0078; allow a few steps of slack
    assert float(np.abs(a16 - a8).mean()) < 0.01
    # real audio, not silence/ramp: energy present in both
    assert float(np.abs(a16).max()) > 0.5


def test_real_wav_audio_features():
    """audio_features over real recorded audio: geometry columns exact,
    energy stats finite and nonzero."""
    f = mc.audio_features((_REAL / "pluck-pcm16.wav").read_bytes(), {"format": "wav"})
    n, ch, sr, dur = f[0], f[1], f[2], f[3]
    assert (n, ch, sr, dur) == (3307.0, 2.0, 11025.0, 299.0)
    assert np.all(np.isfinite(f)) and abs(f[4]) > 0


def test_png_16bit_roundtrip_and_filters():
    """16-bit PNG (network byte order, byte-lane filters) — the depth GRIB2
    PNG packing (template 5.41) uses."""
    import struct
    import zlib

    grey = ((np.arange(7 * 9).reshape(7, 9) * 700) % 65536).astype(np.uint16)
    out, meta = mc.decode_png(mc.encode_png(grey))
    assert meta["bit_depth"] == 16 and out.dtype == np.uint16
    assert (out[:, :, 0] == grey).all()
    rgb = ((np.arange(5 * 4 * 3).reshape(5, 4, 3) * 9999) % 65536).astype(np.uint16)
    o2, m2 = mc.decode_png(mc.encode_png(rgb))
    assert m2["bit_depth"] == 16 and (o2 == rgb).all()

    # Sub-filtered 16-bit scanline, validated against an independent byte-
    # level reference: recon[x] = raw[x] + recon[x - bpp] (bpp = 2)
    w, h = 4, 1
    raw_px = np.array([[1000, 1003, 1001, 1007]], dtype=np.uint16)
    be = raw_px.astype(">u2").tobytes()
    line = np.frombuffer(be, np.uint8).astype(np.int64)
    filtered = line.copy()
    filtered[2:] = (line[2:] - line[:-2]) & 0xFF  # Sub with 2-byte lanes
    scan = b"\x01" + filtered.astype(np.uint8).tobytes()

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got, _ = mc.decode_png(png)
    assert (got[0, :, 0] == raw_px[0]).all()


def _png_chunk_t(t, d):
    import struct
    import zlib

    return struct.pack(">I", len(d)) + t + d + struct.pack(
        ">I", zlib.crc32(t + d) & 0xFFFFFFFF
    )


def _png_raw(w, h, depth, color, scan, extra=b"", interlace=0):
    import struct
    import zlib

    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
        + extra
        + _png_chunk_t(b"IDAT", zlib.compress(scan))
        + _png_chunk_t(b"IEND", b"")
    )


def test_png_lowdepth_gray_decodes_scaled():
    """Depth-4 gray (formerly a named error): samples scale by the spec's
    exact 255/(2^d−1) = 17 factor. The 2×2 payload is the one the old
    negative test pinned — now a positive anchor."""
    png = _png_raw(2, 2, 4, 0, b"\x00\x11\x00\x22")
    out, meta = mc.decode_png(png)
    assert meta["bit_depth"] == 4 and meta["n_channels"] == 1
    assert out[..., 0].tolist() == [[17, 17], [34, 34]]
    # depth 1: bits MSB-first, scale 255; 10 wide forces padding bits
    row = b"\x00" + bytes([0b10110001, 0b01000000])
    png1 = _png_raw(10, 1, 1, 0, row)
    o1, m1 = mc.decode_png(png1)
    assert o1[0, :, 0].tolist() == [255, 0, 255, 255, 0, 0, 0, 255, 0, 255]
    # depth 2: scale 85
    png2 = _png_raw(3, 1, 2, 0, b"\x00" + bytes([0b11_01_10_00]))
    o2, _ = mc.decode_png(png2)
    assert o2[0, :, 0].tolist() == [255, 85, 170]


def test_png_illegal_depth_color_combo_raises():
    """Depth 4 is legal for gray/palette but NOT for RGB (spec Table 11.1)."""
    with pytest.raises(mc.MediaDecodeError, match="illegal"):
        mc.decode_png(_png_raw(2, 1, 4, 2, b"\x00\x11\x22"))


def test_adam7_grid_partitions_exactly():
    """Structural pin on the §8.2 constants: the 7 passes must tile the
    8×8 base grid with every cell covered exactly once — a typo in any
    origin/stride double-covers or misses a cell."""
    cover = np.zeros((8, 8), dtype=int)
    for x0, y0, dx, dy in mc._ADAM7:
        cover[y0::dy, x0::dx] += 1
    assert (cover == 1).all()


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (5, 7), (8, 8), (9, 10), (16, 13)])
@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_adam7_roundtrip_equals_sequential(h, w, c):
    """Interlaced encode → decode is identity AND byte-identical to the
    already-validated sequential decode of the same pixels — the same
    anchoring trick the progressive-JPEG work used. Sizes below the pass
    origins exercise empty passes."""
    img = np.random.RandomState(h * 100 + w * 10 + c).randint(
        0, 256, (h, w, c), dtype=np.uint8
    )
    via_i, meta_i = mc.decode_png(mc.encode_png(img, interlace=True))
    via_s, meta_s = mc.decode_png(mc.encode_png(img))
    assert np.array_equal(via_i, img.reshape(h, w, c))
    assert np.array_equal(via_i, via_s)
    assert meta_i == meta_s


def test_png_adam7_16bit_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 65536, (11, 6, 3), dtype=np.uint16)
    out, meta = mc.decode_png(mc.encode_png(img, interlace=True))
    assert out.dtype == np.uint16 and np.array_equal(out, img)
    assert meta["bit_depth"] == 16


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_palette_roundtrip(depth, interlace):
    """Color-type-3: indices at every legal depth, with and without Adam7,
    decode to exactly palette[idx]."""
    rng = np.random.RandomState(depth * 7 + interlace)
    n = 1 << depth
    pal = rng.randint(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.randint(0, n, (9, 11), dtype=np.uint8)
    png = mc.encode_png_indexed(idx, pal, bit_depth=depth, interlace=interlace)
    out, meta = mc.decode_png(png)
    assert meta["n_channels"] == 3 and meta["bit_depth"] == depth
    assert np.array_equal(out, pal[idx])


def test_png_palette_trns_alpha_table():
    """tRNS on type 3 is a per-index alpha table, 255 beyond its length."""
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    png = mc.encode_png_indexed(idx, pal, bit_depth=2, trns=bytes([10, 200]))
    out, meta = mc.decode_png(png)
    assert meta["n_channels"] == 4
    assert np.array_equal(out[..., :3], pal[idx])
    assert out[..., 3].tolist() == [[10, 200, 255], [255, 200, 10]]


def test_png_colorkey_trns():
    """tRNS on types 0/2 is a single color key (16-bit fields in depth
    units): matching pixels get alpha 0, everything else full."""
    import struct

    # RGB 8-bit: key (7, 8, 9)
    img = np.array([[[7, 8, 9], [7, 8, 10]]], dtype=np.uint8)
    scan = b"\x00" + img.tobytes()
    png = _png_raw(2, 1, 8, 2, scan, extra=_png_chunk_t(b"tRNS", struct.pack(">3H", 7, 8, 9)))
    out, meta = mc.decode_png(png)
    assert meta["n_channels"] == 4
    assert out[0, 0].tolist() == [7, 8, 9, 0] and out[0, 1].tolist() == [7, 8, 10, 255]
    # gray 16-bit: key 0x0102
    g = np.array([[0x0102, 0x0103]], dtype=">u2")
    png16 = _png_raw(
        2, 1, 16, 0, b"\x00" + g.tobytes(), extra=_png_chunk_t(b"tRNS", struct.pack(">H", 0x0102))
    )
    o16, m16 = mc.decode_png(png16)
    assert o16.dtype == np.uint16 and m16["n_channels"] == 2
    assert o16[0, 0].tolist() == [0x0102, 0] and o16[0, 1].tolist() == [0x0103, 65535]
    # gray depth-1 color key compares in DEPTH units (before scaling)
    png1 = _png_raw(
        2, 1, 1, 0, b"\x00" + bytes([0b10000000]), extra=_png_chunk_t(b"tRNS", struct.pack(">H", 1))
    )
    o1, _ = mc.decode_png(png1)
    assert o1[0, 0].tolist() == [255, 0] and o1[0, 1].tolist() == [0, 255]


def test_png_bomb_and_dimension_guards():
    """Forged-dimension and inflation bombs die at the guard, not at a
    multi-GiB allocation: (a) implausible declared dims; (b) an IDAT that
    inflates past the geometry-derived cap."""
    import zlib

    with pytest.raises(mc.MediaDecodeError, match="implausible"):
        mc.decode_png(_png_raw(1 << 15, 1 << 15, 8, 2, b"\x00"))
    # 3×1 RGB expects 10 raw bytes; hand the inflater 64 MiB of zeros
    bomb = zlib.compress(b"\x00" * (64 << 20))
    with pytest.raises(mc.MediaDecodeError, match="length mismatch"):
        mc.decode_png(_png_raw(3, 1, 8, 2, b"")[: -len(_png_chunk_t(b"IDAT", zlib.compress(b"")) + _png_chunk_t(b"IEND", b""))] + _png_chunk_t(b"IDAT", bomb) + _png_chunk_t(b"IEND", b""))


def test_png_palette_index_out_of_range_raises():
    """A 2-entry PLTE with a depth-8 index of 5 must be the contract
    error, not an IndexError leak."""
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    png = mc.encode_png_indexed(np.zeros((2, 2), np.uint8), pal, bit_depth=8)
    # bump one decoded index beyond the palette by rebuilding the IDAT
    import zlib

    scan = b"\x00\x00\x05" + b"\x00\x00\x00"
    bad = _png_raw(2, 2, 8, 3, scan, extra=_png_chunk_t(b"PLTE", pal.tobytes()))
    with pytest.raises(mc.MediaDecodeError, match="palette index"):
        mc.decode_png(bad)
    # well-formed original still decodes
    out, _ = mc.decode_png(png)
    assert np.array_equal(out, pal[np.zeros((2, 2), int)])


def test_png_new_paths_fuzz_fails_cleanly():
    """The repo-wide parser-hardening bar for the new PNG paths: mutated
    interlaced/palette/tRNS streams decode or raise the contract error —
    never hang, alloc-bomb, or leak a foreign exception."""
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (13, 9), dtype=np.uint8)
    bases = [
        bytearray(mc.encode_png(img, interlace=True)),
        bytearray(mc.encode_png_indexed(idx, pal, bit_depth=4, interlace=True)),
        bytearray(mc.encode_png_indexed(idx, pal, bit_depth=8, trns=bytes(range(16)))),
    ]
    for trial in range(1800):
        blob = bytearray(bases[trial % 3])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(8, len(blob))]
        try:
            mc.decode_png(bytes(blob))
        except mc.MediaDecodeError:
            pass


@pytest.mark.parametrize("comp", ["none", "lzw", "deflate", "packbits"])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("be", [False, True])
def test_tiff_uint16_roundtrip(comp, pred, be):
    """16-bit unsigned samples (the GeoTIFF DEM/radiance flavor) across
    the full codec × predictor × byte-order matrix, strips and tiles."""
    img = np.random.RandomState(1).randint(0, 65536, (13, 9, 3), dtype=np.uint16)
    out, _ = mc.decode_tiff(
        mc.encode_tiff(img, compression=comp, predictor=pred, big_endian=be,
                       rows_per_strip=5)
    )
    assert out.dtype == np.uint16 and np.array_equal(out, img)
    out_t, _ = mc.decode_tiff(
        mc.encode_tiff(img, compression=comp, predictor=pred, big_endian=be,
                       tile_size=(16, 16))
    )
    assert np.array_equal(out_t, img)


def test_tiff_int16_signed_roundtrip():
    """int16 (SampleFormat 2) with negatives: predictor 2's wrap-diff in
    the unsigned lane is exact on two's-complement values."""
    img = np.random.RandomState(2).randint(-30000, 30000, (7, 11, 1), dtype=np.int16)
    for pred in (1, 2):
        out, _ = mc.decode_tiff(mc.encode_tiff(img, compression="lzw", predictor=pred))
        assert out.dtype == np.int16 and np.array_equal(out, img)


@pytest.mark.parametrize("comp", ["none", "lzw", "deflate"])
@pytest.mark.parametrize("pred", [1, 3])
@pytest.mark.parametrize("be", [False, True])
def test_tiff_float32_roundtrip(comp, pred, be):
    """float32 (SampleFormat 3) bit-exact round-trip incl. NaN/Inf and the
    TechNote-3 byte-split predictor 3, both byte orders and tiled."""
    rng = np.random.RandomState(3)
    img = rng.uniform(-1e6, 1e6, (9, 17, 2)).astype(np.float32)
    img[0, 0, 0] = np.nan
    img[1, 1, 1] = np.inf
    out, _ = mc.decode_tiff(
        mc.encode_tiff(img, compression=comp, predictor=pred, big_endian=be)
    )
    assert out.dtype == np.float32 and np.array_equal(out, img, equal_nan=True)


def test_tiff_float32_tiled_predictor3():
    img = np.random.RandomState(4).uniform(-10, 10, (9, 16, 2)).astype(np.float32)
    out, _ = mc.decode_tiff(mc.encode_tiff(img, predictor=3, tile_size=(16, 16)))
    assert np.array_equal(out, img)


def test_tiff_wide_predictor_pinned_bytes():
    """External anchors for the two predictor schemes, not just encoder/
    decoder self-consistency: (a) predictor 2 at 16-bit stores per-sample
    wrap-diffs in file order — [1000, 1003, 1001] LE ⇒ E8 03 | 03 00 |
    FE FF; (b) predictor 3 splits each row's BIG-ENDIAN float bytes by
    significance then byte-diffs — [1.0, 2.0] = 3F800000/40000000 ⇒
    interleave 3F 40 80 00 00 00 00 00 ⇒ diff 3F 01 40 80 00 00 00 00."""
    blob = mc.encode_tiff(np.array([[1000, 1003, 1001]], np.uint16), predictor=2)
    assert blob[8:14] == bytes([0xE8, 0x03, 0x03, 0x00, 0xFE, 0xFF])
    o, _ = mc.decode_tiff(blob)
    assert o[0, :, 0].tolist() == [1000, 1003, 1001]
    blobf = mc.encode_tiff(np.array([[1.0, 2.0]], np.float32), predictor=3)
    assert blobf[8:16] == bytes([0x3F, 0x01, 0x40, 0x80, 0, 0, 0, 0])
    of, _ = mc.decode_tiff(blobf)
    assert of[0, :, 0].tolist() == [1.0, 2.0]


def test_tiff_wide_sample_guards():
    """JPEG strips stay 8-bit-only; predictor 2 is integer-only and 3 is
    float-only, enforced on BOTH sides of the codec."""
    img16 = np.zeros((4, 4), np.uint16)
    f32 = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="8-bit"):
        mc.encode_tiff(img16, compression="jpeg")
    with pytest.raises(ValueError, match="predictor"):
        mc.encode_tiff(f32, predictor=2)
    with pytest.raises(ValueError, match="predictor"):
        mc.encode_tiff(img16, predictor=3)
    # decoder: flip a well-formed uint16 predictor tag to 3
    import struct

    b = bytearray(mc.encode_tiff(img16, predictor=2))
    ent = struct.pack("<HHI", 317, 3, 1) + struct.pack("<H", 2) + b"\x00\x00"
    pos = bytes(b).find(ent)
    assert pos >= 0
    b[pos : pos + 12] = struct.pack("<HHI", 317, 3, 1) + struct.pack("<H", 3) + b"\x00\x00"
    with pytest.raises(mc.MediaDecodeError, match="float samples only"):
        mc.decode_tiff(bytes(b))


def test_tiff_white_is_zero_16bit():
    """PhotometricInterpretation 0 inverts at the sample's full scale."""
    import struct

    b = bytearray(mc.encode_tiff(np.array([[1, 65535]], np.uint16)))
    ent = struct.pack("<HHI", 262, 3, 1) + struct.pack("<H", 1) + b"\x00\x00"
    pos = bytes(b).find(ent)
    assert pos >= 0
    b[pos : pos + 12] = struct.pack("<HHI", 262, 3, 1) + struct.pack("<H", 0) + b"\x00\x00"
    out, _ = mc.decode_tiff(bytes(b))
    assert out[0, :, 0].tolist() == [65534, 0]


def test_tiff_wide_sample_fuzz_fails_cleanly():
    """Parser-hardening bar for the wide-sample paths: mutated 16-bit and
    float TIFFs decode or raise the contract error."""
    rng = np.random.RandomState(29)
    img16 = rng.randint(0, 65536, (13, 9, 3), dtype=np.uint16)
    i16 = rng.randint(-30000, 30000, (7, 11, 1), dtype=np.int16)
    f32 = rng.uniform(-1e6, 1e6, (9, 17, 2)).astype(np.float32)
    bases = [
        bytearray(mc.encode_tiff(img16, compression="lzw", predictor=2)),
        bytearray(mc.encode_tiff(f32, compression="deflate", predictor=3)),
        bytearray(mc.encode_tiff(i16, compression="packbits")),
    ]
    for trial in range(1500):
        blob = bytearray(bases[trial % 3])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(8, len(blob))]
        try:
            mc.decode_tiff(bytes(blob))
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def test_bmp_24bit_roundtrip_via_encoder():
    img = np.random.RandomState(31).randint(0, 256, (7, 5, 3), dtype=np.uint8)
    out, meta = mc.decode_bmp(mc.encode_bmp(img))
    assert np.array_equal(out, img) and meta["n_channels"] == 3


@pytest.mark.parametrize("rle", [False, True])
def test_bmp_8bit_palette_roundtrip(rle):
    rng = np.random.RandomState(33)
    pal = rng.randint(0, 256, (17, 3), dtype=np.uint8)
    # runs + noise: exercises both the run and literal shapes of RLE8
    idx = np.repeat(rng.randint(0, 17, (9, 4), dtype=np.uint8), 3, axis=1)[:, :11]
    out, _ = mc.decode_bmp(mc.encode_bmp_indexed(idx, pal, rle=rle))
    assert np.array_equal(out, pal[idx])


def test_bmp_rle8_escapes_hand_pinned():
    """Hand-built RLE8 stream: encoded run, absolute run with word pad,
    delta skip (skipped pixels stay index 0), EOL, EOS — the full escape
    set on one 4×3 canvas, values asserted cell by cell."""
    pal = np.array([[0, 0, 0], [10, 0, 0], [20, 0, 0], [30, 0, 0]], np.uint8)
    data = bytes(
        [
            2, 1,          # run: 2× index 1      -> row0: 1 1 . .
            0, 3, 2, 3, 2, 0,  # absolute: 3 literals (2,3,2) + 1 pad byte
                           #                      -> row0: 1 1 2 3 (2 clips)
            0, 0,          # EOL                  -> row 1
            0, 2, 1, 1,    # delta dx=1 dy=1      -> skips to row 2, x=1
            3, 3,          # run: 3× index 3      -> row2: . 3 3 3
            0, 1,          # end of bitmap
        ]
    )
    hdr = mc._bmp_headers(4, 3, 8, 1, 4, len(data))
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal.tolist())
    out, _ = mc.decode_bmp(hdr + pal_bytes + data)
    idx_expect_file_order = [
        [1, 1, 2, 3],  # file row 0 (bottom of image)
        [0, 0, 0, 0],  # file row 1 (delta skipped it)
        [0, 3, 3, 3],  # file row 2
    ]
    assert np.array_equal(out, pal[np.array(idx_expect_file_order)[::-1]])


def test_bmp_rle4_hand_pinned():
    """RLE4: encoded runs alternate the byte's nibbles high-first;
    absolute runs pack nibbles and pad to a word boundary."""
    pal = np.array([[i * 10, 0, 0] for i in range(6)], np.uint8)
    data = bytes(
        [
            5, 0x12,        # run of 5 alternating 1,2 -> 1 2 1 2 1
            0, 3, 0x34, 0x50, 0, 0,  # absolute 3 nibbles (3,4,5) + pad
            0, 0,           # EOL
            0, 1,           # EOS
        ]
    )
    hdr = mc._bmp_headers(8, 1, 4, 2, 6, len(data))
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal.tolist())
    out, _ = mc.decode_bmp(hdr + pal_bytes + data)
    assert np.array_equal(out[0], pal[np.array([1, 2, 1, 2, 1, 3, 4, 5])])


def test_bmp_lowbpp_uncompressed():
    """4-bit and 1-bit BI_RGB: MSB-first packing, 4-byte row alignment,
    hand-built rows."""
    pal = np.array([[0, 0, 9], [1, 1, 1], [2, 2, 2], [3, 3, 3]], np.uint8)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal.tolist())
    # 3 px @ 4bpp: nibbles 1,2,3 -> bytes 0x12 0x30 + 2 pad = stride 4
    hdr = mc._bmp_headers(3, 1, 4, 0, 4, 4)
    out, _ = mc.decode_bmp(hdr + pal_bytes + bytes([0x12, 0x30, 0, 0]))
    assert np.array_equal(out[0], pal[np.array([1, 2, 3])])
    # 10 px @ 1bpp: bits 1011000101 -> 0xB1 0x40 + 2 pad
    pal2 = np.array([[5, 5, 5], [200, 100, 50]], np.uint8)
    pal2_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal2.tolist())
    hdr2 = mc._bmp_headers(10, 1, 1, 0, 2, 4)
    out2, _ = mc.decode_bmp(hdr2 + pal2_bytes + bytes([0b10110001, 0b01000000, 0, 0]))
    assert np.array_equal(out2[0], pal2[np.array([1, 0, 1, 1, 0, 0, 0, 1, 0, 1])])


def test_bmp_32bit_and_bitfields():
    import struct

    # 32-bit BI_RGB: BGRX quads, 2×1
    quads = bytes([30, 20, 10, 0, 60, 50, 40, 0])
    hdr = mc._bmp_headers(2, 1, 32, 0, 0, len(quads))
    out, meta = mc.decode_bmp(hdr + quads)
    assert out[0].tolist() == [[10, 20, 30], [40, 50, 60]] and meta["n_channels"] == 3
    # BI_BITFIELDS with canonical BGRA masks -> alpha carried
    hdr3 = bytearray(mc._bmp_headers(2, 1, 32, 3, 0, len(quads)))
    masks = struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    # data offset moves past the masks; header size moves to V4-ish 56
    hdr3[14:18] = struct.pack("<I", 56)
    hdr3[10:14] = struct.pack("<I", 14 + 56)
    quads_a = bytes([30, 20, 10, 128, 60, 50, 40, 255])
    out3, meta3 = mc.decode_bmp(bytes(hdr3[:54]) + masks + quads_a)
    assert meta3["n_channels"] == 4
    assert out3[0].tolist() == [[10, 20, 30, 128], [40, 50, 60, 255]]
    # non-canonical masks refuse
    bad = struct.pack("<IIII", 0x000000FF, 0x0000FF00, 0x00FF0000, 0)
    with pytest.raises(mc.MediaDecodeError, match="bitfields"):
        mc.decode_bmp(bytes(hdr3[:54]) + bad + quads_a)


def test_bmp_rle_malformed_fuzz():
    """RLE streams are cursor machines — the classic CVE shape is an
    out-of-bounds write via delta/run past the canvas. Mutations must
    decode (clipped) or raise the contract error; nothing else."""
    rng = np.random.RandomState(37)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (11, 13), dtype=np.uint8)
    bases = [
        bytearray(mc.encode_bmp_indexed(idx, pal, rle=True)),
        bytearray(mc.encode_bmp_indexed(idx, pal)),
        bytearray(mc.encode_bmp(rng.randint(0, 256, (9, 7, 3), dtype=np.uint8))),
    ]
    for trial in range(1500):
        blob = bytearray(bases[trial % 3])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(2, len(blob))]
        try:
            mc.decode_bmp(bytes(blob))
        except mc.MediaDecodeError:
            pass


@pytest.mark.parametrize("bits,tol", [(16, 1 / 32768), (24, 1 / (1 << 23)),
                                      (32, 1 / (1 << 31)), (-32, 0.0)])
def test_wav_wide_pcm_roundtrip(bits, tol):
    """PCM 16/24/32-bit and IEEE float32 (bits=-32): round-trip error is
    bounded by half an LSB of the chosen width; float is exact."""
    x = np.random.RandomState(41).uniform(-0.99, 0.99, (500, 2)).astype(np.float32)
    out, meta = mc.decode_wav(mc.encode_wav(x, 44100, bits=bits))
    assert out.shape == x.shape and meta["sample_rate"] == 44100
    assert float(np.abs(out - x).max()) <= tol


def test_wav_extensible_and_float64():
    """WAVE_FORMAT_EXTENSIBLE (SubFormat GUID) unwraps to the inner PCM
    format; IEEE float64 data decodes through the same contract."""
    import struct

    x = np.random.RandomState(43).uniform(-0.9, 0.9, (200, 2)).astype(np.float32)
    blob = bytearray(mc.encode_wav(x, 16000, bits=24))
    i = bytes(blob).find(b"fmt ")
    (orig_len,) = struct.unpack("<I", blob[i + 4 : i + 8])
    core = bytes(blob[i + 8 : i + 8 + orig_len])
    guid = struct.pack("<H", 1) + bytes.fromhex("000000001000800000aa00389b71")
    ext = (
        struct.pack("<HHIIHH", 0xFFFE, *struct.unpack("<HHIIHH", core)[1:])
        + struct.pack("<HHI", 22, 24, 0x3)
        + guid
    )
    blob2 = (
        bytes(blob[:i]) + b"fmt " + struct.pack("<I", len(ext)) + ext
        + bytes(blob[i + 8 + orig_len :])
    )
    blob2 = blob2[:4] + struct.pack("<I", len(blob2) - 8) + blob2[8:]
    out, _ = mc.decode_wav(blob2)
    assert float(np.abs(out - x).max()) <= 1 / (1 << 23)
    # a non-PCM SubFormat GUID must refuse, not misread
    bad = blob2.replace(bytes.fromhex("000000001000800000aa00389b71"),
                        bytes.fromhex("00000000100080000000000000ff"))
    with pytest.raises(mc.MediaDecodeError, match="SubFormat"):
        mc.decode_wav(bad)
    # float64: rebuild the data chunk at 8 bytes/sample
    mono = x[:, 0]
    hdr = bytearray(mc.encode_wav(mono, 8000, bits=-32))
    j = bytes(hdr).find(b"fmt ")
    hdr[j + 8 : j + 24] = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
    k = bytes(hdr).find(b"data")
    d64 = mono.astype("<f8").tobytes()
    f64 = bytes(hdr[:k]) + b"data" + struct.pack("<I", len(d64)) + d64
    f64 = f64[:4] + struct.pack("<I", len(f64) - 8) + f64[8:]
    o64, _ = mc.decode_wav(f64)
    assert np.allclose(o64[:, 0], mono)


def test_wav_zero_channels_refuses():
    import struct

    blob = bytearray(mc.encode_wav(np.zeros(8, np.float32)))
    i = bytes(blob).find(b"fmt ")
    blob[i + 10 : i + 12] = struct.pack("<H", 0)
    with pytest.raises(mc.MediaDecodeError, match="zero channels"):
        mc.decode_wav(bytes(blob))


def _gif_anim(frames_spec, sw=4, sh=4, gct=((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))):
    """Hand-built GIF89a: frames_spec = [(left, top, idx2d, disposal,
    tindex-or-None), ...] over a shared 4-entry global palette."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
    for r, g, b in gct:
        out += bytes([r, g, b])
    for left, top, idx, disposal, tindex in frames_spec:
        idx = np.asarray(idx, dtype=np.uint8)
        h, w = idx.shape
        flags = (disposal << 2) | (1 if tindex is not None else 0)
        out += bytes([0x21, 0xF9, 0x04, flags, 5, 0, tindex or 0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        mcs = 2
        out += bytes([mcs])
        payload = mc._gif_lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(payload), 255):
            part = payload[i : i + 255]
            out += bytes([len(part)]) + part
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_transparency_composites_delta_frames():
    """Frame 2 draws a 2×2 patch whose transparent pixels must keep frame
    1's canvas underneath — the delta-frame convention every animation
    encoder emits."""
    f1 = np.full((4, 4), 1, np.uint8)              # all red
    f2 = np.array([[3, 0], [0, 3]], np.uint8)      # blue/transparent checker
    gif = _gif_anim([(0, 0, f1, 0, None), (1, 1, f2, 0, 0)])
    frames, meta = mc.decode_gif_frames(gif)
    assert meta["n_frames"] == 2
    assert np.array_equal(frames[0], np.tile([255, 0, 0], (4, 4, 1)))
    # frame 2: blue at (1,1) and (2,2); red shows through the 0-index holes
    assert frames[1][1, 1].tolist() == [0, 0, 255]
    assert frames[1][2, 2].tolist() == [0, 0, 255]
    assert frames[1][1, 2].tolist() == [255, 0, 0]
    assert frames[1][2, 1].tolist() == [255, 0, 0]


def test_gif_disposal_background_and_previous():
    """Disposal 2 clears the drawn rect to background (black) before the
    next frame; disposal 3 restores the canvas under the previous draw."""
    base = np.full((4, 4), 1, np.uint8)            # red canvas
    patch = np.full((2, 2), 2, np.uint8)           # green patch
    dot = np.array([[3]], np.uint8)                # blue dot
    # disposal 2 on the patch: frame 3's canvas shows BLACK where the
    # patch was (except where the dot draws)
    gif2 = _gif_anim([(0, 0, base, 0, None), (1, 1, patch, 2, None), (0, 0, dot, 0, None)])
    frames, _ = mc.decode_gif_frames(gif2)
    assert frames[1][1, 1].tolist() == [0, 255, 0]
    assert frames[2][1, 1].tolist() == [0, 0, 0]       # cleared to background
    assert frames[2][0, 0].tolist() == [0, 0, 255]     # the new dot
    assert frames[2][3, 3].tolist() == [255, 0, 0]     # untouched canvas
    # disposal 3 on the patch: frame 3 shows the canvas UNDER the patch
    gif3 = _gif_anim([(0, 0, base, 0, None), (1, 1, patch, 3, None), (0, 0, dot, 0, None)])
    frames3, _ = mc.decode_gif_frames(gif3)
    assert frames3[1][1, 1].tolist() == [0, 255, 0]
    assert frames3[2][1, 1].tolist() == [255, 0, 0]    # restored to previous
    assert frames3[2][0, 0].tolist() == [0, 0, 255]


def test_gif_full_canvas_animation_regression():
    """encode_gif_animation's full-canvas disposal-0 frames decode exactly
    as before the compositing upgrade."""
    rng = np.random.RandomState(47)
    frames = rng.randint(0, 256, (3, 5, 7, 3), dtype=np.uint8)
    # quantization-free content: constant frames
    frames = np.stack([np.full((5, 7, 3), 40 * (i + 1), np.uint8) for i in range(3)])
    dec, meta = mc.decode_gif_frames(mc.encode_gif_animation(frames))
    assert meta["n_frames"] == 3
    assert np.array_equal(dec, frames)


@pytest.mark.parametrize("entry", ["png", "bmp"])
@pytest.mark.parametrize("c", [3, 4])
def test_ico_roundtrip_both_entry_kinds(entry, c):
    img = np.random.RandomState(53).randint(0, 256, (9, 7, c), dtype=np.uint8)
    out, meta = mc.decode_ico(mc.encode_ico(img, entry=entry))
    assert meta["format"] == "ico" and meta["container_entries"] == 1
    if entry == "bmp" and c == 3:
        # classic DIB always carries alpha (opaque mask)
        assert meta["n_channels"] == 4
        assert np.array_equal(out[..., :3], img)
        assert (out[..., 3] == 255).all()
    else:
        assert np.array_equal(out[..., :c], img if c == 4 else img)


def test_ico_dib_and_mask_becomes_alpha():
    """Hand-built classic entry: 24-bpp 2×2 XOR block + an AND mask with
    one transparent pixel — the mask bit drives alpha, bottom-up."""
    import struct

    # XOR rows bottom-up, BGR, 4-byte padded (2*3=6 -> pad to 8)
    row_bot = bytes([30, 20, 10, 60, 50, 40]) + b"\x00\x00"   # image row 1
    row_top = bytes([90, 80, 70, 120, 110, 100]) + b"\x00\x00" # image row 0
    # AND mask: 1 bpp, 4-byte-aligned rows, bottom-up; set ONLY the
    # top-left pixel transparent -> in file order that's the LAST row,
    # first bit
    mask = (b"\x00" + b"\x00" * 3) + (b"\x80" + b"\x00" * 3)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 4, 1, 24, 0, 0, 0, 0, 0, 0)
    payload = dib + row_bot + row_top + mask
    ico = (
        b"\x00\x00\x01\x00\x01\x00"
        + bytes([2, 2, 0, 0]) + struct.pack("<HHII", 1, 24, len(payload), 22)
        + payload
    )
    out, meta = mc.decode_ico(ico)
    assert meta["n_channels"] == 4
    assert out[0, 0].tolist() == [70, 80, 90, 0]      # transparent
    assert out[0, 1].tolist() == [100, 110, 120, 255]
    assert out[1, 0].tolist() == [10, 20, 30, 255]
    assert out[1, 1].tolist() == [40, 50, 60, 255]


def test_ico_multi_entry_picks_largest():
    small = np.full((4, 4, 3), 10, np.uint8)
    big = np.full((16, 16, 3), 200, np.uint8)
    import struct

    p_small, p_big = mc.encode_png(small), mc.encode_png(big)
    head = b"\x00\x00\x01\x00" + struct.pack("<H", 2)
    off1 = 6 + 32
    e1 = bytes([4, 4, 0, 0]) + struct.pack("<HHII", 1, 24, len(p_small), off1)
    e2 = bytes([16, 16, 0, 0]) + struct.pack("<HHII", 1, 24, len(p_big), off1 + len(p_small))
    out, meta = mc.decode_ico(head + e1 + e2 + p_small + p_big)
    assert meta["container_entries"] == 2
    assert out.shape[:2] == (16, 16) and (out[..., 0] == 200).all()


def test_ico_via_decode_image_dispatch_and_probe():
    img = np.full((8, 8, 3), 90, np.uint8)
    blob = mc.encode_ico(img)
    out, meta = mc.decode_image(blob)
    assert meta["format"] == "ico"
    assert mc.probe_media(blob)["format"] == "ico"


def test_ico_fuzz_fails_cleanly():
    rng = np.random.RandomState(59)
    img = rng.randint(0, 256, (11, 9, 4), dtype=np.uint8)
    bases = [bytearray(mc.encode_ico(img, entry="png")),
             bytearray(mc.encode_ico(img, entry="bmp"))]
    for trial in range(1200):
        blob = bytearray(bases[trial % 2])
        for _ in range(rng.randint(1, 6)):
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        if trial % 5 == 0:
            blob = blob[: rng.randint(4, len(blob))]
        try:
            mc.decode_ico(bytes(blob))
        except mc.MediaDecodeError:
            pass
