"""CCSDS 121.0-B Rice/AEC coder (sources/ccsds_aec.py) + GRIB2 5.42.

No libaec exists in this container, so correctness is pinned by (1)
hand-built bitstreams for each coding option derived from the standard's
layout rules, (2) property round-trips across the parameter grid, and
(3) the GRIB2 integration contract: a 5.42 message must decode
BIT-identically to the 5.0 decode of the same field (the entropy layer
is pure transport for the scaled integers, like the PNG template).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from zarr_climate_etl_ipfs_spark.sources import ccsds_aec as A
from zarr_climate_etl_ipfs_spark.sources.grib2 import (
    GRIB2Error,
    GRIB2Message,
    parse_grib2,
    write_grib2,
)


# ---------------------------------------------------------------------------
# Hand-built bitstream vectors (standard layout rules)
# ---------------------------------------------------------------------------


def test_mapper_hand_values():
    """The standard mapper: theta = min(pred, xmax-pred); 2e / 2|e|-1 /
    theta+|e|. For n=8, x=[100, 103, 98, 255]: refs then e=3,-5,157 →
    d=6,9, theta(98)=98 → 98+157=255."""
    d = A._map_rsi(np.array([100, 103, 98, 255]), 8)
    assert list(d) == [100, 6, 9, 255]
    back = A._unmap_rsi(np.array([100, 6, 9, 255]), 8)
    assert list(back) == [100, 103, 98, 255]


def test_zero_block_stream_layout():
    """All-zero field, J=8, one RSI: one zero-block option = ID 0 (3 bits
    for n=8) + ext bit 0 + raw reference (8 bits) + FS(run). 16 samples =
    2 blocks → run of 2 → FS value 1 = '01'. Total bits:
    3+1+8+2 = 14 → two bytes, MSB-first: 0000 0000 0000 0100 0(pad)."""
    enc = A.aec_encode(np.zeros(16, dtype=int), 8, block_size=8, rsi=128)
    assert enc == bytes([0b00000000, 0b00000100])
    assert (A.aec_decode(enc, 16, 8, 8, 128) == 0).all()


def test_uncompressed_option_layout():
    """Noise that defeats every option must select the all-ones ID and
    emit raw n-bit samples."""
    x = np.array([0, 255, 0, 255, 0, 255, 0, 255], dtype=int)
    enc = A.aec_encode(x, 8, block_size=8, rsi=128, preprocess=False)
    # ID=7 (3 bits '111') then 8 raw bytes, shifted by 3 bits
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("111")
    vals = [int(bits[3 + 8 * i : 11 + 8 * i], 2) for i in range(8)]
    assert vals == list(x)


def test_fs_k_split_layout():
    """k=0 sample splitting: FS codes are unary (v zeros then a 1).
    All-2s makes k=0 cost 24 bits, beating second extension (52) and
    raw (64); ties with k=1 resolve to the first (smaller k) option."""
    x = np.full(8, 2, dtype=int)
    enc = A.aec_encode(x, 8, block_size=8, rsi=128, preprocess=False)
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("001" + "001" * 8)  # ID=1 then eight FS(2)
    assert (A.aec_decode(enc, 8, 8, 8, 128, False) == x).all()


def test_second_extension_roundtrip_and_selection():
    """Pairs of tiny values with occasional larger ones favor the
    second-extension transform m = (d1+d2)(d1+d2+1)/2 + d2."""
    x = np.array([0, 0, 1, 0, 0, 0, 0, 1] * 4, dtype=int)
    enc = A.aec_encode(x, 8, block_size=32, rsi=128, preprocess=False)
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("000" + "1")  # ID 0, ext bit 1 = second extension
    assert (A.aec_decode(enc, len(x), 8, 32, 128, False) == x).all()


def test_ros_marker_rest_of_segment():
    """> 4 zero blocks flushed at a segment/data end use the ROS marker
    (FS value 4), which the decoder expands to the segment remainder."""
    x = np.zeros(8 * 10, dtype=int)  # 10 zero blocks, J=8
    enc = A.aec_encode(x, 8, block_size=8, rsi=128, preprocess=False)
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("000" + "0" + "00001")  # ID 0, ext 0, FS(4)=ROS
    assert (A.aec_decode(enc, len(x), 8, 8, 128, False) == 0).all()


def test_id_width_tracks_bits_per_sample():
    for n, idl in ((8, 3), (12, 4), (16, 4), (17, 5), (32, 5)):
        assert A._id_len(n) == idl


def test_flag_validation():
    assert A.check_flags(A.FLAG_MSB | A.FLAG_PREPROCESS) is True
    assert A.check_flags(A.FLAG_MSB) is False
    for bad in (A.FLAG_SIGNED, A.FLAG_RESTRICTED, A.FLAG_3BYTE, A.FLAG_PAD_RSI):
        with pytest.raises(A.AECError):
            A.check_flags(bad)


def test_out_of_range_and_truncation_errors():
    with pytest.raises(A.AECError, match="range"):
        A.aec_encode(np.array([256]), 8)
    enc = A.aec_encode(np.arange(100) % 200, 8)
    with pytest.raises(A.AECError, match="truncated"):
        A.aec_decode(enc[: max(1, len(enc) // 4)], 100, 8)


@given(
    data=st.lists(st.integers(0, 2**12 - 1), min_size=1, max_size=600),
    block=st.sampled_from([8, 16, 32, 64]),
    rsi=st.sampled_from([1, 2, 64]),
    pp=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(data, block, rsi, pp):
    x = np.array(data, dtype=np.int64)
    enc = A.aec_encode(x, 12, block, rsi, pp)
    assert (A.aec_decode(enc, len(x), 12, block, rsi, pp) == x).all()


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_roundtrip_smooth_fields(data):
    """Smooth cumulative fields (the GRIB-realistic case) at several bit
    depths, including the saturated-mapper fallback path."""
    n = data.draw(st.sampled_from([8, 10, 16, 20]))
    steps = data.draw(st.lists(st.integers(-5, 5), min_size=1, max_size=500))
    x = np.cumsum(np.array(steps)).clip(0, (1 << n) - 1)
    enc = A.aec_encode(x, n)
    assert (A.aec_decode(enc, len(x), n) == x).all()


# ---------------------------------------------------------------------------
# GRIB2 template 5.42 integration
# ---------------------------------------------------------------------------


def _msg():
    lats = np.linspace(50, 40, 6)
    lons = np.linspace(-110, -100, 8)
    vals = (np.add.outer(lats, lons) * 0.13 + 7.5).astype("f8")
    vals[3, 2] = np.nan
    return GRIB2Message(
        discipline=0, parameter_category=1, parameter_number=8,
        ref_time=dt.datetime(2024, 3, 1, 6), forecast_seconds=3600,
        level_type=1, level=0, lats=lats, lons=lons, values=vals,
        ensemble_member=None, attrs={},
    )


def test_grib2_ccsds_matches_simple_packing():
    """5.42 must decode bit-identically to 5.0 of the same message —
    the entropy stage is pure transport for the scaled integers."""
    msg = _msg()
    for bits in (8, 12, 16):
        simple = parse_grib2(write_grib2([msg], bits_per_value=bits, template=0))[0]
        aec = parse_grib2(write_grib2([msg], bits_per_value=bits, template=42))[0]
        s, a = simple.values, aec.values
        assert np.isnan(s[3, 2]) and np.isnan(a[3, 2])
        m = ~np.isnan(s)
        assert (s[m] == a[m]).all()
        assert aec.attrs["bits"] == bits


def test_grib2_ccsds_sec5_octets():
    """Section 5 for 5.42 carries flags/block/RSI in octets 22-25."""
    raw = write_grib2([_msg()], bits_per_value=10, template=42)
    p = 16
    while p < len(raw) - 4:
        if raw[p + 4] == 5:
            assert int.from_bytes(raw[p + 9 : p + 11], "big") == 42
            assert int.from_bytes(raw[p : p + 4], "big") == 25
            assert raw[p + 21] == A.FLAG_MSB | A.FLAG_PREPROCESS
            assert raw[p + 22] == 32
            assert int.from_bytes(raw[p + 23 : p + 25], "big") == 128
            return
        p += int.from_bytes(raw[p : p + 4], "big")
    pytest.fail("no section 5 found")


def test_grib2_ccsds_unsupported_flags_raise():
    raw = bytearray(write_grib2([_msg()], bits_per_value=10, template=42))
    p = 16
    while p < len(raw) - 4:
        if raw[p + 4] == 5:
            raw[p + 21] |= A.FLAG_RESTRICTED
            break
        p += int.from_bytes(raw[p : p + 4], "big")
    with pytest.raises(GRIB2Error, match="restricted"):
        parse_grib2(bytes(raw))
