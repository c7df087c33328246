"""WebP lossless (VP8L) codec tests — round-trip properties through the
test-grade encoder, hand-crafted bitstreams for the decoder-only paths
(predictor / color transform / meta-prefix groups / 2D distance codes),
and fuzz hardening.

Reference parity: the reference ETL delegates image decode to external
libs; these tests pin the pure-stdlib VP8L implementation feeding the
multimodal featurize seam.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zarr_climate_etl_ipfs_spark import mediacodecs as mc
from zarr_climate_etl_ipfs_spark import webp_vp8l as wl


def _rt(img, **kw):
    out, meta = wl.decode_webp(wl.encode_webp(img, **kw))
    exp = img if img.ndim == 3 else np.dstack([img] * 3)
    assert out.shape == exp.shape
    assert np.array_equal(out, exp)
    return meta


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.sampled_from([3, 4]),
    st.booleans(),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_webp_roundtrip_property(h, w, nch, subgreen, cache_bits, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, nch), dtype=np.uint8)
    meta = _rt(img, use_subtract_green=subgreen, cache_bits=cache_bits)
    assert (meta["height"], meta["width"]) == (h, w)
    assert meta["channels"] == nch
    assert meta["lossless"] is True


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=40),
    st.sampled_from([2, 3, 4, 16, 17, 200]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_webp_palette_roundtrip_property(h, w, ncolors, seed):
    """Color-indexing transform incl. sub-byte packing (1/2/4-bit) and the
    delta-coded palette, across the width-bits thresholds."""
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    img = palette[rng.randint(0, ncolors, (h, w))]
    _rt(img, palette=True)


def test_webp_lz77_compresses_runs():
    """Distance-1 runs must both round-trip and actually shrink the file
    (the LZ77 path is exercised, not just legal)."""
    img = np.repeat(np.random.RandomState(1).randint(0, 256, (8, 4, 3), dtype=np.uint8), 16, axis=1)
    with_runs = wl.encode_webp(img, lz77=True)
    without = wl.encode_webp(img, lz77=False)
    assert len(with_runs) < len(without) / 2
    _rt(img)


def _header(bw, w, h, alpha=0):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(alpha, 1)
    bw.write(0, 3)


def _argb_flat(a, r, g, b):
    return (
        (a.astype(np.uint64) << 24)
        | (r.astype(np.uint64) << 16)
        | (g.astype(np.uint64) << 8)
        | b.astype(np.uint64)
    ).reshape(-1)


@pytest.mark.parametrize("mode", range(14))
def test_webp_predictor_modes_decode(mode):
    """All 14 predictor modes: forward-transform residuals in the test,
    hand-emit a predictor-transform stream, decode must restore the
    target (incl. the rightmost-column TR wrap and the row-0/col-0 edge
    rules)."""
    w, h = 5, 4
    rng = np.random.RandomState(100 + mode)
    target = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    # channel order [a, r, g, b] with opaque alpha
    tgt = np.dstack([np.full((h, w), 255, np.uint8), target])
    res = np.zeros_like(tgt)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = wl._predict(0, None, None, None, None)
            elif y == 0:
                pred = tgt[0, x - 1]
            elif x == 0:
                pred = tgt[y - 1, 0]
            else:
                L = tgt[y, x - 1]
                T = tgt[y - 1, x]
                TR = tgt[y - 1, x + 1] if x + 1 < w else tgt[y, 0]
                TL = tgt[y - 1, x - 1]
                pred = wl._predict(mode, L, T, TR, TL)
            res[y, x] = (tgt[y, x].astype(int) - pred.astype(int)) % 256
    bw = wl._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(wl._PREDICTOR, 2)
    bw.write(3 - 2, 3)  # block size 8 -> 1x1 mode subimage for 5x4
    wl._encode_entropy_image(
        bw, np.array([0xFF000000 | (mode << 8)], np.uint64), 0, False, level0=False
    )
    bw.write(0, 1)  # no more transforms
    wl._encode_entropy_image(
        bw, _argb_flat(res[..., 0], res[..., 1], res[..., 2], res[..., 3]),
        0, True, level0=True,
    )
    out, _ = wl.decode_vp8l(bw.finish())
    assert np.array_equal(out, target), f"mode {mode}"


def test_webp_color_transform_decodes():
    """Color transform: non-trivial green→red / green→blue / red→blue int8
    multipliers, forward residuals built with the decoder's own delta
    kernel, hand-emitted stream must invert exactly."""
    w, h = 6, 3
    g2r, g2b, r2b = 17, 250, 5  # 250 = int8 -6
    rng = np.random.RandomState(7)
    target = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    r = target[..., 0].astype(np.int32)
    g = target[..., 1].astype(np.uint8)
    b = target[..., 2].astype(np.int32)
    d_g2r = wl._ctd(np.full(g.shape, g2r, np.uint8).view(np.int8), g.view(np.int8))
    d_g2b = wl._ctd(np.full(g.shape, g2b, np.uint8).view(np.int8), g.view(np.int8))
    d_r2b = wl._ctd(
        np.full(g.shape, r2b, np.uint8).view(np.int8),
        target[..., 0].view(np.int8),
    )
    r_res = ((r - d_g2r) & 0xFF).astype(np.uint8)
    b_res = ((b - d_g2b - d_r2b) & 0xFF).astype(np.uint8)
    bw = wl._BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(wl._COLOR, 2)
    bw.write(3 - 2, 3)  # block size 8 -> single transform element
    cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    wl._encode_entropy_image(bw, np.array([cte], np.uint64), 0, False, level0=False)
    bw.write(0, 1)
    a = np.full((h, w), 255, np.uint8)
    wl._encode_entropy_image(
        bw, _argb_flat(a, r_res, target[..., 1], b_res), 0, True, level0=True
    )
    out, _ = wl.decode_vp8l(bw.finish())
    assert np.array_equal(out, target)


def test_webp_meta_prefix_groups_decode():
    """Meta-prefix image: two tiles selecting two different code groups,
    each group a degenerate 0-bit code set — the per-pixel group routing
    itself is what's under test."""
    w, h = 8, 2
    colors = [(10, 20, 30), (200, 150, 99)]
    bw = wl._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-prefix image present
    bw.write(2 - 2, 3)  # meta_bits=2 -> 2x1 meta image for 8x2
    meta_px = np.array([0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)], np.uint64)
    wl._encode_entropy_image(bw, meta_px, 0, False, level0=False)
    for rr, gg, bb in colors:  # two groups, 5 single-symbol codes each
        for sym, alphabet in ((gg, 280), (rr, 256), (bb, 256), (255, 256), (0, 40)):
            codes = wl._write_prefix_code(bw, {sym: 0}, alphabet)
            assert codes[sym] == (0, 0)
    # all five codes in both groups are 0-bit: the 16 pixels cost no bits
    out, _ = wl.decode_vp8l(bw.finish())
    exp = np.zeros((h, w, 3), np.uint8)
    exp[:, :4] = colors[0]
    exp[:, 4:] = colors[1]
    assert np.array_equal(out, exp)


def test_webp_2d_distance_code_decodes():
    """LZ77 with a 2D plane code: copy row 0 onto row 1 via plane code 1
    ((0,1) -> distance = width), exercising the distance map rather than
    the >120 direct encoding the encoder uses."""
    w, h = 6, 2
    rng = np.random.RandomState(3)
    row = rng.randint(0, 256, (w, 3), dtype=np.uint8)
    bw = wl._BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    len_code, len_val, len_bits = wl._prefix_encode(w)  # copy length = w
    greens = {int(g): 1 for g in row[:, 1]}
    greens[256 + len_code] = greens.get(256 + len_code, 0) + 1
    gl = wl._complete_lengths(wl._huffman_lengths(greens, 15), 280)
    gcodes = wl._write_prefix_code(bw, gl, 280)
    rcodes = wl._write_prefix_code(
        bw, wl._complete_lengths(wl._huffman_lengths({int(v): 1 for v in row[:, 0]}, 15), 256), 256
    )
    bcodes = wl._write_prefix_code(
        bw, wl._complete_lengths(wl._huffman_lengths({int(v): 1 for v in row[:, 2]}, 15), 256), 256
    )
    acodes = wl._write_prefix_code(bw, {255: 0}, 256)
    dcodes = wl._write_prefix_code(bw, {0: 0}, 40)  # plane prefix code 0 -> plane 1

    def emit(codes, sym):
        code, ln = codes[sym]
        if ln:
            bw.write_code(code, ln)

    for x in range(w):  # row 0 literals
        emit(gcodes, int(row[x, 1]))
        emit(rcodes, int(row[x, 0]))
        emit(bcodes, int(row[x, 2]))
        emit(acodes, 255)
    emit(gcodes, 256 + len_code)  # copy length w at distance w
    if len_bits:
        bw.write(len_val, len_bits)
    emit(dcodes, 0)
    out, _ = wl.decode_vp8l(bw.finish())
    assert np.array_equal(out[0], row)
    assert np.array_equal(out[1], row)


def test_webp_dispatch_and_lossy_raises():
    """decode_image routes RIFF/WEBP VP8L here; lossy VP8 still names
    libwebp; VP8X-wrapped lossless files decode through the chunk walk."""
    img = np.full((4, 4, 3), 42, np.uint8)
    blob = wl.encode_webp(img)
    out, meta = mc.decode_image(blob)
    assert np.array_equal(out, img) and meta["format"] == "webp"
    # VP8X-extended container: prepend a VP8X chunk before VP8L
    vp8l_chunk = blob[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    ext = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk)) + b"WEBP" + vp8x + vp8l_chunk
    out2, _ = wl.decode_webp(ext)
    assert np.array_equal(out2, img)
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(NotImplementedError, match="libwebp"):
        wl.decode_webp(lossy)


def test_webp_fuzz_truncation_and_garbage():
    """Truncations and bit flips of a valid stream must raise
    MediaDecodeError (or the NotImplementedError seam) — never leak
    IndexError/ValueError, never hang, never allocate unbounded."""
    img = np.random.RandomState(0).randint(0, 256, (9, 7, 3), dtype=np.uint8)
    blob = wl.encode_webp(img, cache_bits=3)
    for cut in range(12, len(blob), 7):
        try:
            wl.decode_webp(blob[:cut])
        except (mc.MediaDecodeError, NotImplementedError):
            pass
    rng = np.random.RandomState(1)
    # full-byte mutations at the same regression depth as the other
    # foreign-bytes suites (an 8000-trial sweep ran clean when the
    # parser-hardening bar was set repo-wide)
    for trial in range(1000):
        hacked = bytearray(blob)
        for _ in range(rng.randint(1, 6)):
            hacked[rng.randint(0, len(hacked))] = rng.randint(0, 256)
        if trial % 5 == 0:
            hacked = hacked[: rng.randint(4, len(hacked))]
        try:
            out, _ = wl.decode_webp(bytes(hacked))
            assert out.nbytes <= 4 * wl._MAX_PIXELS
        except (mc.MediaDecodeError, NotImplementedError):
            pass


def test_webp_declared_size_bomb_rejected():
    """A tiny payload declaring the max 16383x16383 canvas must be rejected
    by the pixel cap before any allocation loop."""
    bw = wl._BitWriter()
    _header(bw, 16383, 16383)
    bw.write(0, 1)
    bw.write(0, 1)
    with pytest.raises(mc.MediaDecodeError):
        wl.decode_vp8l(bw.finish() + b"\x00" * 8)


def test_webp_distance_map_generative_rule():
    """The 120-entry 2D distance table must satisfy its generative rule —
    unique near-neighborhood offsets sorted by squared distance with
    |x|-then-sign tie-break — so a transcription slip in any row is
    caught structurally, not just by the two codes the encoder uses."""
    pairs = wl._DIST_MAP
    assert len(pairs) == 120
    assert len(set(pairs)) == 120
    assert all(0 <= y <= 7 and -7 <= x <= 8 for x, y in pairs)
    assert all(y > 0 or x > 0 for x, y in pairs)  # strictly backward refs
    key = [(x * x + y * y, abs(x), 0 if x >= 0 else 1) for x, y in pairs]
    assert key == sorted(key)


def test_predict_scalar_matches_numpy_reference():
    """_predict_scalar (the hot decode path) must agree with the numpy
    _predict reference on every mode across random neighborhoods — any
    divergence is a silent pixel corruption."""
    rng = np.random.RandomState(11)
    for _ in range(200):
        L, T, TR, TL = (tuple(int(v) for v in rng.randint(0, 256, 4)) for _ in range(4))
        for mode in range(14):
            ref = wl._predict(
                mode,
                np.array(L, np.uint8), np.array(T, np.uint8),
                np.array(TR, np.uint8), np.array(TL, np.uint8),
            )
            got = wl._predict_scalar(mode, L, T, TR, TL)
            assert tuple(int(v) for v in ref) == tuple(got), (mode, L, T, TR, TL)


def test_webp_palette_oob_index_decodes_transparent_black():
    """RFC 9649 §4.2.3: a packed palette index past the color table must
    decode as 0x00000000 (transparent black), not error — spec-legal files
    can carry stray high bits in packed lanes (round-8 advisor catch)."""
    pal = np.array([[255, 10, 20, 30], [255, 40, 50, 60]], np.uint8)
    # width_bits=2 → 2 bits/pixel, 4 px/byte; indices 0,1,2,3 where 2 and 3
    # exceed the 2-color table
    ch = np.zeros((1, 4), np.uint8)
    ch[0, 2] = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    out = wl._inverse_color_indexing(ch, 2, pal, orig_w=4)
    assert np.array_equal(out[0], pal[0])
    assert np.array_equal(out[1], pal[1])
    assert np.array_equal(out[2], [0, 0, 0, 0])
    assert np.array_equal(out[3], [0, 0, 0, 0])


# -- lossy VP8: header probe + injection seam (round-13 decision record) ------

from pathlib import Path  # noqa: E402

_REAL_VP8 = Path(__file__).parent / "fixtures" / "real" / "cpython_logo_vp8.webp"


def _vp8_chunk(content: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def test_probe_vp8_real_libwebp_golden():
    """probe_vp8 on a REAL libwebp bitstream: every field below the
    coefficient-probability loop, pinned. These values are recovered
    through the RFC 6386 boolean arithmetic decoder, so the golden also
    validates the bool decoder + key-frame header layout end-to-end —
    a desynchronized parse would yield garbage quantizer/partition
    fields, not this coherent set."""
    from zarr_climate_etl_ipfs_spark.webp_vp8 import probe_vp8

    m = probe_vp8(_vp8_chunk(_REAL_VP8.read_bytes()))
    assert m == {
        "format": "webp-vp8",
        "width": 16,
        "height": 16,
        "version": 0,
        "segmentation": False,
        "filter_type": "normal",
        "filter_level": 12,
        "sharpness": 0,
        "n_dct_partitions": 1,
        "y_ac_qi": 26,
        "quant_deltas": {"y1dc": 0, "y2dc": 0, "y2ac": 0, "uvdc": -2, "uvac": 6},
        "first_partition_bytes": 20,
    }


def test_probe_vp8_malformed():
    from zarr_climate_etl_ipfs_spark.webp_vp8 import VP8Error, probe_vp8

    good = _vp8_chunk(_REAL_VP8.read_bytes())
    with pytest.raises(VP8Error, match="key frame"):
        probe_vp8(bytes([good[0] | 1]) + good[1:])  # interframe bit
    with pytest.raises(VP8Error, match="start code"):
        probe_vp8(good[:3] + b"\x00\x00\x00" + good[6:])
    with pytest.raises(VP8Error, match="shorter"):
        probe_vp8(good[:6])


def test_probe_vp8_mutation_fuzz_single_exception_contract():
    """Repo parser bar: foreign/corrupt bytes surface as the ONE contract
    exception (VP8Error), never a raw struct/index error — 1500 mutations
    of the real frame plus random blobs."""
    import random

    from zarr_climate_etl_ipfs_spark.webp_vp8 import VP8Error, probe_vp8

    good = _vp8_chunk(_REAL_VP8.read_bytes())
    rng = random.Random(1311)
    for _ in range(1200):
        mut = bytearray(good)
        for _ in range(rng.randrange(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        if rng.random() < 0.3:
            mut = mut[: rng.randrange(len(mut))]
        try:
            m = probe_vp8(bytes(mut))
            assert 0 < m["width"] <= 0x3FFF and 0 < m["height"] <= 0x3FFF
        except VP8Error:
            pass
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        try:
            probe_vp8(blob)
        except VP8Error:
            pass


def test_probe_media_routes_lossy_webp_to_header_probe():
    """probe_media must answer metadata for lossy WebP WITHOUT the pixel
    decoder (a probe that raises NotImplementedError is not a probe)."""
    m = mc.probe_media(_REAL_VP8.read_bytes())
    assert m["format"] == "webp-vp8" and (m["width"], m["height"]) == (16, 16)
    # VP8X extended-container fields ride along (this file has an ALPH chunk)
    assert m["has_alpha"] is True and m["has_animation"] is False
    assert (m["canvas_width"], m["canvas_height"]) == (16, 16)


def test_probe_media_webp_failure_contract_and_lossless_vp8x():
    """Round-13 review fixes: (a) a truncated VP8X and a corrupt VP8 chunk
    must surface as MediaDecodeError (the module's adversarial-bytes
    contract), never IndexError/VP8Error; (b) VP8X canvas/alpha fields
    ride along for extended LOSSLESS files too — the probe surface must
    not depend on which codec the still used."""
    import struct as _struct

    def riff(chunks):
        body = b"WEBP"
        for tag, payload in chunks:
            body += tag + _struct.pack("<I", len(payload)) + payload
            if len(payload) & 1:
                body += b"\x00"
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    # (a) VP8X declares 10 bytes but the buffer truncates to 1
    trunc = riff([(b"VP8X", _struct.pack("<I", 0))])  # bogus tiny payload
    with pytest.raises(mc.MediaDecodeError):
        mc.probe_media(riff([(b"VP8X", b"\x10"), (b"VP8 ", b"\x00" * 12)]))
    del trunc
    # corrupt VP8 chunk (interframe bit) → MediaDecodeError, not VP8Error
    good = _REAL_VP8.read_bytes()
    vp8 = bytearray(_vp8_chunk(good))
    vp8[0] |= 1
    with pytest.raises(mc.MediaDecodeError, match="VP8 chunk"):
        mc.probe_media(riff([(b"VP8 ", bytes(vp8))]))

    # (b) extended-lossless: wrap a real VP8L encode in a VP8X container
    import numpy as np

    px = np.zeros((4, 4, 3), np.uint8)
    px[..., 1] = 200
    plain = wl.encode_webp(px)
    vp8l = None
    for tag, payload in wl.iter_webp_chunks(plain):
        if tag == b"VP8L":
            vp8l = payload
    vp8x_payload = bytes([0x10, 0, 0, 0]) + b"\x03\x00\x00" + b"\x03\x00\x00"
    ext = riff([(b"VP8X", vp8x_payload), (b"VP8L", vp8l)])
    m = mc.probe_media(ext)
    assert m["has_alpha"] is True and (m["canvas_width"], m["canvas_height"]) == (4, 4)
    assert m["width"] == 4  # the VP8L decode's own meta is still there
    # decode_webp must surface the same VP8X fields for extended lossless
    # files — probe and decode are ONE metadata surface (r14 review catch:
    # the r14 fix had only covered the injected-lossy branch)
    rgb2, dm = wl.decode_webp(ext)
    assert rgb2.shape == (4, 4, 3)
    assert dm["has_alpha"] is True and dm["has_animation"] is False
    assert (dm["canvas_width"], dm["canvas_height"]) == (4, 4)
    # plain (non-extended) lossless keeps its meta unchanged — empty merge
    _, plain_meta = wl.decode_webp(plain)
    assert "canvas_width" not in plain_meta


def test_injected_audio_decoder_bad_sample_rate():
    """A plugin returning sample_rate=0 (or junk) must fail as
    MediaDecodeError, not ZeroDivisionError (round-13 review)."""
    raw = b"OggS" + bytes(32)
    import numpy as np

    for bad_rate in (0, -1, "44100", None, True):
        with pytest.raises(mc.MediaDecodeError, match="sample_rate"):
            mc.decode_audio(
                raw, decoder=lambda c, f: (np.zeros((4, 1)), {"sample_rate": bad_rate})
            )


def test_webp_lossy_named_error_and_injection_seam():
    """Real lossy WebP: the bare call raises the NAMED error (never a
    mis-decode — the decision-record contract), and an injected decoder
    gets the raw VP8 chunk and returns pixels; a shape-lying plugin is
    refused against the engine-parsed header dims."""
    raw = _REAL_VP8.read_bytes()
    with pytest.raises(NotImplementedError, match="vp8_decoder="):
        wl.decode_webp(raw)

    calls = []

    def fake_vp8(chunk: bytes):
        calls.append(len(chunk))
        assert chunk[3:6] == b"\x9d\x01\x2a"  # got the raw frame payload
        return np.full((16, 16, 3), 77, np.uint8), {"decoder": "fake"}

    rgb, meta = wl.decode_webp(raw, vp8_decoder=fake_vp8)
    assert calls == [190]
    assert rgb.shape == (16, 16, 3)
    assert meta["format"] == "webp" and meta["lossless"] is False
    assert meta["y_ac_qi"] == 26 and meta["decoder"] == "fake"
    # VP8X fields must match what probe_media surfaces for the same file
    # (round-13 advice: the two metadata surfaces were inconsistent)
    assert meta["has_alpha"] is True and meta["has_animation"] is False
    assert (meta["canvas_width"], meta["canvas_height"]) == (16, 16)
    with pytest.raises(mc.MediaDecodeError, match="shape"):
        wl.decode_webp(raw, vp8_decoder=lambda c: (np.zeros((8, 8, 3), np.uint8), {}))


def test_probe_vp8_zero_first_partition_raises():
    """part1_size == 0 (or a few bytes) must raise VP8Error, not return a
    structurally-valid dict decoded from synthetic zero bits (round-13
    advice: _BoolDec used to read zeros past the buffer end)."""
    import struct as _struct

    from zarr_climate_etl_ipfs_spark.webp_vp8 import VP8Error, probe_vp8

    def frame(part1: int, tail: bytes) -> bytes:
        # key frame, version 0, show=1: 3-byte tag carries part1_size
        tag = (part1 << 5) | (1 << 4)
        return (
            bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
            + b"\x9d\x01\x2a"
            + _struct.pack("<HH", 16, 16)
            + tail
        )

    with pytest.raises(VP8Error, match="exhausted"):
        probe_vp8(frame(0, b"\x00" * 32))
    with pytest.raises(VP8Error, match="exhausted"):
        probe_vp8(frame(1, b"\x00" * 32))
    # the real frame still probes clean (its 20-byte partition suffices)
    m = probe_vp8(_vp8_chunk(_REAL_VP8.read_bytes()))
    assert m["first_partition_bytes"] == 20


def test_probe_media_animated_lossy_webp_returns_vp8x_meta():
    """Animated lossy WebP nests VP8 frames inside ANMF, so there is no
    top-level VP8/VP8L chunk; probe_media must return the VP8X metadata
    (typed as an animation) instead of dying with a misleading
    'no VP8L chunk found' (round-13 advice)."""
    import struct as _struct

    def riff(chunks):
        body = b"WEBP"
        for tag, payload in chunks:
            body += tag + _struct.pack("<I", len(payload)) + payload
            if len(payload) & 1:
                body += b"\x00"
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    # VP8X: animation bit (0x02), canvas 32x24; ANIM + one ANMF frame
    vp8x = bytes([0x02, 0, 0, 0]) + b"\x1f\x00\x00" + b"\x17\x00\x00"
    anim = b"\x00\x00\x00\xff\x00\x00"  # bg color + loop count
    anmf = bytes(16) + b"VP8 " + _struct.pack("<I", 4) + b"\x00" * 4
    m = mc.probe_media(riff([(b"VP8X", vp8x), (b"ANIM", anim), (b"ANMF", anmf)]))
    assert m["format"] == "webp" and m["codec"] == "animated"
    assert m["has_animation"] is True
    assert (m["canvas_width"], m["canvas_height"]) == (32, 24)
