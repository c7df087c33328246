"""GRIB2 reader/writer + ingest (S8; the reference's actual GRIB path is
kerchunk.grib2.scan_grib, utils/transform.py:19, 211-253 — here decoded from
the published WMO FM 92-XIV spec, template 3.0/4.0/5.0 subset)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.sources.grib2 import (
    GRIB2Error,
    GRIB2Message,
    grib2_decoder,
    parse_grib2,
    write_grib2,
)
from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize, read_binary_gridded
from zarr_climate_etl_ipfs_spark.sources.store import GridStore


def _slab(nj=4, ni=5, seed=0, t0=dt.datetime(2021, 9, 16), holes=False):
    rng = np.random.RandomState(seed)
    vals = np.round(rng.uniform(0, 50, (nj, ni)), 2)
    if holes:
        vals[1, 1] = np.nan
        vals[3, 4] = np.nan
    return GRIB2Message(
        discipline=0,
        parameter_category=1,  # moisture
        parameter_number=8,  # total precipitation
        level_type=1,
        level=0,
        ref_time=t0,
        lats=np.linspace(40.0, 10.0, nj),
        lons=np.linspace(100.0, 140.0, ni),
        values=vals,
    )


def test_roundtrip_simple_packing():
    msg = _slab()
    out = parse_grib2(write_grib2([msg], bits_per_value=16, decimal_scale=2))
    assert len(out) == 1
    got = out[0]
    assert (got.parameter_category, got.parameter_number) == (1, 8)
    assert got.ref_time == msg.ref_time
    np.testing.assert_allclose(got.lats, msg.lats, atol=1e-6)
    np.testing.assert_allclose(got.lons, msg.lons, atol=1e-6)
    # float32 reference value bounds the error: rel ~1e-7 of the scaled range
    np.testing.assert_allclose(got.values, msg.values, atol=1e-3)


def test_roundtrip_bitmap_and_multi_message():
    msgs = [
        _slab(seed=1, t0=dt.datetime(2021, 9, 16), holes=True),
        _slab(seed=2, t0=dt.datetime(2021, 9, 17)),
    ]
    out = parse_grib2(write_grib2(msgs))
    assert [m.ref_time.day for m in out] == [16, 17]
    assert np.isnan(out[0].values[1, 1]) and np.isnan(out[0].values[3, 4])
    mask = ~np.isnan(msgs[0].values)
    np.testing.assert_allclose(out[0].values[mask], msgs[0].values[mask], atol=1e-3)


@pytest.mark.parametrize("template,order", [(2, 2), (3, 1), (3, 2)])
def test_roundtrip_complex_packing(template, order):
    """Templates 5.2 (group splitting) and 5.3 (spatial differencing of
    order 1/2) — the encodings real ERA5/GFS GRIB2 feeds use. Smooth fields
    exercise differencing's negative-gmin path; bitmapped holes compose."""
    nj, ni = 8, 40
    yy, xx = np.mgrid[0:nj, 0:ni]
    vals = np.round(20 + 10 * np.sin(xx / 5.0) + 0.5 * yy, 2)  # smooth ramp
    msg = _slab(nj=nj, ni=ni)
    msg.values = vals
    out = parse_grib2(
        write_grib2([msg], decimal_scale=2, template=template, diff_order=order)
    )[0]
    np.testing.assert_allclose(out.values, vals, atol=1e-3)

    holed = vals.copy()
    holed[2, 7] = np.nan
    holed[5, 31] = np.nan
    msg.values = holed
    out = parse_grib2(
        write_grib2([msg], decimal_scale=2, template=template, diff_order=order)
    )[0]
    assert np.isnan(out.values[2, 7]) and np.isnan(out.values[5, 31])
    mask = ~np.isnan(holed)
    np.testing.assert_allclose(out.values[mask], holed[mask], atol=1e-3)


def test_complex_packing_equals_simple_packing():
    """The same slab encoded via 5.0, 5.2 and 5.3 decodes to identical
    values (both are exact over the shared scaled-int pipeline)."""
    msg = _slab(nj=6, ni=9, seed=7)
    simple = parse_grib2(write_grib2([msg], template=0))[0].values
    complex2 = parse_grib2(write_grib2([msg], template=2))[0].values
    complex3 = parse_grib2(write_grib2([msg], template=3, diff_order=2))[0].values
    np.testing.assert_array_equal(simple, complex2)
    np.testing.assert_array_equal(simple, complex3)


def test_statistical_product_template_4_8_roundtrip():
    """PDT 4.8 (statistical processing over an interval — how real GRIB2
    precip accumulations are labelled): parameter/level/values decode as
    for 4.0, with the interval end and process surfaced in attrs."""
    msg = _slab(seed=5)
    msg.attrs = {
        "interval_end": dt.datetime(2021, 9, 17, 6),
        "statistical_process": 1,  # accumulation
    }
    out = parse_grib2(write_grib2([msg]))[0]
    assert (out.parameter_category, out.parameter_number) == (1, 8)
    assert out.ref_time == msg.ref_time
    assert out.attrs["interval_end"] == dt.datetime(2021, 9, 17, 6)
    assert out.attrs["statistical_process"] == 1
    np.testing.assert_allclose(out.values, msg.values, atol=1e-3)


def test_ensemble_template_4_1_roundtrip():
    """PDT 4.1 (individual ensemble member): perturbation number, ensemble
    type/size and forecast lead time all survive the roundtrip — the
    product labelling the reference's `ensemble` dataset category ingests
    (utils/attributes.py:223-247, utils/transform.py:210-218)."""
    msgs = []
    for member in (0, 1, 2):
        m = _slab(seed=10 + member)
        m.ensemble_member = member
        m.forecast_seconds = 6 * 3600
        m.attrs = {"ensemble_type": 3, "ensemble_size": 3}
        msgs.append(m)
    out = parse_grib2(write_grib2(msgs))
    assert [m.ensemble_member for m in out] == [0, 1, 2]
    for got, want in zip(out, msgs):
        assert got.forecast_seconds == 6 * 3600
        assert got.attrs["ensemble_type"] == 3
        assert got.attrs["ensemble_size"] == 3
        np.testing.assert_allclose(got.values, want.values, atol=1e-3)


def test_ensemble_statistical_template_4_11_roundtrip():
    """PDT 4.11 = ensemble member + statistical interval: both the member
    number and the 4.8-style interval/process fields decode (they are
    shifted 3 octets past the ensemble block)."""
    m = _slab(seed=21)
    m.ensemble_member = 7
    m.forecast_seconds = 2 * 86400
    m.attrs = {
        "ensemble_type": 2,
        "ensemble_size": 11,
        "interval_end": dt.datetime(2021, 9, 18, 12),
        "statistical_process": 0,  # average
    }
    out = parse_grib2(write_grib2([m]))[0]
    assert out.ensemble_member == 7
    assert out.forecast_seconds == 2 * 86400
    assert out.attrs["interval_end"] == dt.datetime(2021, 9, 18, 12)
    assert out.attrs["statistical_process"] == 0
    assert out.attrs["ensemble_size"] == 11
    np.testing.assert_allclose(out.values, m.values, atol=1e-3)


def test_sub_hour_forecast_time_unit():
    m = _slab(seed=22)
    m.ensemble_member = 1
    m.forecast_seconds = 90 * 60  # not whole hours → written in seconds
    out = parse_grib2(write_grib2([m]))[0]
    assert out.forecast_seconds == 90 * 60


def test_interval_end_missing_sentinel_is_omitted_not_valueerror():
    """Real products set interval-end octets to all-ones when templated;
    an invalid calendar date must not escape as a bare ValueError — the
    field is simply omitted (module's clear-error contract)."""
    m = _slab(seed=5)
    m.attrs = {"interval_end": dt.datetime(2021, 9, 17, 6), "statistical_process": 1}
    raw = bytearray(write_grib2([m]))
    p = 16
    while p < len(raw) - 4:
        sec_len = int.from_bytes(raw[p : p + 4], "big")
        if raw[p + 4] == 4:
            for i in range(34, 41):  # year..second → 0xFF sentinels
                raw[p + i] = 0xFF
            break
        p += sec_len
    out = parse_grib2(bytes(raw))[0]
    assert "interval_end" not in out.attrs
    assert out.attrs["statistical_process"] == 1  # rest of the template intact
    np.testing.assert_allclose(out.values, m.values, atol=1e-3)


def test_message_filter_by_level_and_parameter():
    """grib_filter/scan_indices parity (utils/transform.py:137-141): a
    2-layer multi-parameter file, decoder keeps only the selected surface
    message."""
    surface = _slab(seed=31)
    surface.level_type, surface.level = 1, 0
    upper = _slab(seed=32)
    upper.level_type, upper.level = 100, 850
    other_param = _slab(seed=33)
    other_param.parameter_category, other_param.parameter_number = 0, 0
    content = write_grib2([surface, upper, other_param])

    picked = parse_grib2(content, select=lambda h: h["level_type"] == 1)
    assert len(picked) == 2  # other_param is also level_type 1
    picked = parse_grib2(
        content,
        select=lambda h: h["level_type"] == 1 and (h["category"], h["number"]) == (1, 8),
    )
    assert len(picked) == 1
    np.testing.assert_allclose(picked[0].values, surface.values, atol=1e-3)
    # level-value predicate
    picked = parse_grib2(content, select=lambda h: h["level"] == 850)
    assert len(picked) == 1 and picked[0].level == 850


def test_degenerate_complex_packing_raises_clear_error():
    """A slab with <= diff_order present points cannot be spatially
    differenced: clear GRIB2Error, not IndexError."""
    m = _slab(nj=1, ni=1)
    m.values = np.array([[3.25]])
    with pytest.raises(GRIB2Error, match="order 2"):
        write_grib2([m], template=3, diff_order=2)
    # simple and plain-complex packing still handle the 1x1 slab
    np.testing.assert_allclose(
        parse_grib2(write_grib2([m], template=0))[0].values, m.values, atol=1e-3
    )
    np.testing.assert_allclose(
        parse_grib2(write_grib2([m], template=2))[0].values, m.values, atol=1e-3
    )


def test_complex_packing_rejects_missing_management():
    """Missing-value management inside complex packing is out of scope —
    the parser must say so rather than decode garbage."""
    raw = bytearray(write_grib2([_slab()], template=2))
    # find section 5 (skip 16-byte indicator+sec1 21 bytes+sec3 72 bytes...)
    p = 16
    while p < len(raw) - 4:
        sec_len = int.from_bytes(raw[p : p + 4], "big")
        if raw[p + 4] == 5:
            raw[p + 22] = 1  # octet 23: primary missing value management
            break
        p += sec_len
    with pytest.raises(GRIB2Error, match="missing value management"):
        parse_grib2(bytes(raw))


def test_negative_coordinates_sign_magnitude():
    msg = _slab()
    msg.lats = np.linspace(10.0, -20.0, 4)  # crosses the equator
    msg.lons = np.linspace(-91.875, -90.125, 5)  # western hemisphere
    got = parse_grib2(write_grib2([msg]))[0]
    np.testing.assert_allclose(got.lats, msg.lats, atol=1e-6)
    np.testing.assert_allclose(got.lons, msg.lons, atol=1e-6)


def test_parse_rejects_grib1_and_junk():
    from zarr_climate_etl_ipfs_spark.sources.grib1 import write_grib1, GRIB1Message

    g1 = write_grib1(
        [
            GRIB1Message(
                parameter=61, level_type=1, level=0,
                ref_time=dt.datetime(2021, 9, 16),
                lats=np.array([10.0, 20.0]), lons=np.array([100.0, 110.0]),
                values=np.ones((2, 2)),
            )
        ]
    )
    with pytest.raises(GRIB2Error, match="edition 1"):
        parse_grib2(g1)
    with pytest.raises(GRIB2Error, match="not a GRIB2"):
        parse_grib2(b"CDF\x01 netcdf, not grib")


@pytest.fixture
def g2_desc():
    return DatasetDescriptor(
        dataset_name="g2_obs",
        data_var="precip",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2021, 9, 16),
        missing_value=-9999.0,
        time_bucket="month",
    )


def test_ensemble_golden_path_grib2_to_store(spark, tmp_path):
    """Ensemble golden path: real PDT 4.1 GRIB2 bytes → read_binary_gridded
    → canonicalize → store → per-(member, point) equality. Exercises the
    `ensemble` dataset category end-to-end on real-format ingest (the
    reference feeds this category from cfgrib ensemble scans,
    utils/attributes.py:223-247)."""
    desc = DatasetDescriptor(
        dataset_name="g2_ens",
        data_var="t2m",
        time_resolution="daily",
        dataset_category="ensemble",
        time_bucket="month",
    )
    frt = dt.datetime(2021, 9, 16)
    msgs = []
    for member in (0, 1, 2):
        m = _slab(seed=40 + member, t0=frt)
        m.ensemble_member = member
        m.forecast_seconds = 24 * 3600
        m.attrs = {"ensemble_type": 3, "ensemble_size": 3}
        msgs.append(m)
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "ens.grib2").write_bytes(write_grib2(msgs))

    raw = read_binary_gridded(
        spark,
        str(tmp_path / "in" / "*.grib2"),
        desc,
        decoder=grib2_decoder(desc, parameter=(1, 8)),
    )
    canon = canonicalize(raw, desc)
    store = GridStore(tmp_path / "store", desc, spark)
    store.write_initial(canon)

    ds = store.dataset()
    assert ds.count() == 3 * 4 * 5
    assert [r["ensemble"] for r in ds.select("ensemble").distinct().orderBy("ensemble").collect()] == [0, 1, 2]
    got = ds.filter(
        (F.col("ensemble") == 1)
        & (F.col("step") == 24 * 3600)
        & (F.col("latitude") == 30.0)
        & (F.col("longitude") == 120.0)
    ).collect()
    assert len(got) == 1
    assert got[0]["forecast_reference_time"] == frt
    assert got[0]["t2m"] == pytest.approx(msgs[1].values[1, 2], abs=1e-3)


def test_ingest_real_grib2_bytes_end_to_end(spark, tmp_path, g2_desc):
    m1 = _slab(seed=3, t0=dt.datetime(2021, 9, 16))
    m2 = _slab(seed=4, t0=dt.datetime(2021, 9, 17), holes=True)
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "f_16.grib2").write_bytes(write_grib2([m1]))
    (tmp_path / "in" / "f_17.grib2").write_bytes(write_grib2([m2]))

    raw = read_binary_gridded(
        spark,
        str(tmp_path / "in" / "*.grib2"),
        g2_desc,
        decoder=grib2_decoder(g2_desc, parameter=(1, 8)),
    )
    canon = canonicalize(raw, g2_desc)
    store = GridStore(tmp_path / "store", g2_desc, spark)
    store.write_initial(canon)

    ds = store.dataset()
    assert ds.count() == 2 * 4 * 5
    got = ds.filter(
        (F.col("time") == dt.datetime(2021, 9, 16))
        & (F.col("latitude") == 30.0)
        & (F.col("longitude") == 120.0)
    ).collect()
    assert len(got) == 1
    assert got[0]["precip"] == pytest.approx(m1.values[1, 2], abs=1e-3)
    hole = ds.filter(
        (F.col("time") == dt.datetime(2021, 9, 17))
        & (F.col("latitude") == 30.0)
        & (F.col("longitude") == 110.0)
    ).collect()
    assert len(hole) == 1 and hole[0]["precip"] is None


def test_png_packing_matches_simple_packing():
    """Template 5.41 (PNG packing, e.g. NCEP MRMS): same R/E/D/bits as
    simple packing, so the decoded field must be BIT-identical to the
    template 5.0 decode of the same message — the PNG layer is pure
    transport for the scaled integers."""
    import datetime as dt

    lats = np.linspace(50, 40, 5)
    lons = np.linspace(-110, -100, 6)
    vals = np.arange(30, dtype="f8").reshape(5, 6) * 0.37 + 2.5
    vals[2, 3] = np.nan  # exercise the bitmap interaction
    msg = GRIB2Message(
        discipline=0, parameter_category=1, parameter_number=8,
        ref_time=dt.datetime(2024, 3, 1, 6), forecast_seconds=3600,
        level_type=1, level=0, lats=lats, lons=lons, values=vals,
        ensemble_member=None, attrs={},
    )
    for bits in (8, 16):
        simple = parse_grib2(write_grib2([msg], bits_per_value=bits, template=0))[0]
        png = parse_grib2(write_grib2([msg], bits_per_value=bits, template=41))[0]
        s, p = simple.values, png.values
        assert np.isnan(s[2, 3]) and np.isnan(p[2, 3])
        m = ~np.isnan(s)
        assert (s[m] == p[m]).all()
        assert png.attrs["bits"] == bits


def test_png_packing_writer_rejects_odd_depths():
    import datetime as dt

    msg = GRIB2Message(
        discipline=0, parameter_category=1, parameter_number=8,
        ref_time=dt.datetime(2024, 3, 1, 6), forecast_seconds=0,
        level_type=1, level=0, lats=np.array([1.0]), lons=np.array([2.0]),
        values=np.array([[3.0]]), ensemble_member=None, attrs={},
    )
    with pytest.raises(GRIB2Error, match="8- or 16-bit"):
        write_grib2([msg], bits_per_value=12, template=41)


def test_template_numbers_follow_wmo_table_5_0():
    """WMO Table 5.0: 5.40 = JPEG2000 code stream, 5.41 = PNG. A 5.40
    message must raise the named JPEG2000 seam (not be misread as PNG),
    and PNG frames must carry 41 in section 5 octets 10-11."""
    import datetime as dt
    import struct as _struct

    msg = GRIB2Message(
        discipline=0, parameter_category=1, parameter_number=8,
        ref_time=dt.datetime(2024, 3, 1, 6), forecast_seconds=0,
        level_type=1, level=0, lats=np.array([1.0]), lons=np.array([2.0, 3.0]),
        values=np.array([[3.0, 4.0]]), ensemble_member=None, attrs={},
    )
    raw = bytearray(write_grib2([msg], template=41))
    # locate section 5 (first section with number byte 5 after the 16-byte
    # indicator) and check its template number octets
    p = 16
    tmpl_off = None
    while p < len(raw) - 4:
        sec_len = int.from_bytes(raw[p : p + 4], "big")
        if raw[p + 4] == 5:
            tmpl_off = p + 9
            break
        p += sec_len
    assert tmpl_off is not None
    assert _struct.unpack_from(">H", raw, tmpl_off)[0] == 41
    raw[tmpl_off : tmpl_off + 2] = (40).to_bytes(2, "big")
    # make the data payload a REAL JPEG2000 codestream head (SOC + SIZ
    # markers, ISO/IEC 15444-1) so a future half-implementation that peeks
    # at the payload cannot silently mis-decode this pin as PNG bytes
    p2 = 16
    while p2 < len(raw) - 4:
        sec_len = int.from_bytes(raw[p2 : p2 + 4], "big")
        if raw[p2 + 4] == 7:
            jp2 = b"\xff\x4f\xff\x51" + bytes(max(0, sec_len - 5 - 4))
            raw[p2 + 5 : p2 + sec_len] = jp2[: sec_len - 5]
            break
        p2 += sec_len
    with pytest.raises(GRIB2Error, match="JPEG2000"):
        parse_grib2(bytes(raw))


def test_j2k_decoder_injection_seam():
    """Template 5.40 injection seam: a user with a real JPEG2000 codec
    (OpenJPEG/Pillow/eccodes) passes ``j2k_decoder=`` and gets DATA where
    the bare parser raises the named error. The seam hands the decoder the
    raw section-7 payload and applies the R/E/D unscale itself — so the
    fake decoder here returns known X integers and the test pins the full
    unscale path. Mirrors the non-HTTP opener= seam (sources/zarr2)."""
    import datetime as dt
    import struct as _struct

    msg = GRIB2Message(
        discipline=0, parameter_category=1, parameter_number=8,
        ref_time=dt.datetime(2024, 3, 1, 6), forecast_seconds=0,
        level_type=1, level=0, lats=np.array([1.0]), lons=np.array([2.0, 3.0]),
        values=np.array([[3.25, 4.75]]), ensemble_member=None, attrs={},
    )
    # write as simple packing, then flip section 5's template to 40 and
    # replace the payload with a fake codestream the injected decoder reads
    raw = bytearray(write_grib2([msg], bits_per_value=12, template=0))
    simple = parse_grib2(bytes(raw))[0]  # ground truth incl. R/E/D

    p = 16
    packing = {}
    while p < len(raw) - 4:
        sec_len = int.from_bytes(raw[p : p + 4], "big")
        if raw[p + 4] == 5:
            assert _struct.unpack_from(">H", raw, p + 9)[0] == 0
            raw[p + 9 : p + 11] = (40).to_bytes(2, "big")
            packing["bits"] = raw[p + 19]
        if raw[p + 4] == 7:
            # fake "codestream": SOC marker + the X integers as uint16
            payload = b"\xff\x4f" + b"".join(
                int(v).to_bytes(2, "big") for v in _simple_x(bytes(raw), p, sec_len)
            )
            new_sec = (5 + len(payload)).to_bytes(4, "big") + bytes([7]) + payload
            raw[p : p + sec_len] = new_sec
            raw[8:16] = len(raw).to_bytes(8, "big")  # splice changed the length
            break
        p += sec_len

    calls = []

    def fake_j2k(payload: bytes, n: int, bits: int) -> np.ndarray:
        calls.append((len(payload), n, bits))
        assert payload[:2] == b"\xff\x4f"  # got the raw codestream bytes
        return np.frombuffer(payload[2:], dtype=">u2").astype(np.int64)

    # bare parse still refuses with the named error
    with pytest.raises(GRIB2Error, match="j2k_decoder"):
        parse_grib2(bytes(raw))
    got = parse_grib2(bytes(raw), j2k_decoder=fake_j2k)[0]
    assert calls and calls[0][1] == 2 and calls[0][2] == 12
    np.testing.assert_allclose(got.values, simple.values)
    # a short decoder result is a clean refusal, not a crash or mis-decode
    with pytest.raises(GRIB2Error, match="expected 2"):
        parse_grib2(bytes(raw), j2k_decoder=lambda pl, n, b: np.array([1]))


def _simple_x(raw: bytes, sec7_pos: int, sec_len: int) -> list[int]:
    """Recover the packed X integers from a simple-packing section 7 (the
    test writes 12-bit values, so unpack them bit-exactly)."""
    payload = raw[sec7_pos + 5 : sec7_pos + sec_len]
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
    out = []
    for i in range(2):
        seg = bits[i * 12 : (i + 1) * 12]
        out.append(int("".join(map(str, seg)), 2))
    return out


@pytest.mark.parametrize("template", [41, 42])
def test_constant_field_bits0_wins_over_template_dispatch(template):
    """bits_per_value=0 is a legal CONSTANT field for the PNG/CCSDS
    templates too (every value = reference, empty data payload) — the
    constant branch must dispatch before the 41/42 decoders or a foreign
    constant-field message would try to decode its absent payload. Own
    writer never emits bits=0, so this pins the foreign-reader path by
    byte surgery: bits octet -> 0, section 7 payload -> empty."""
    import datetime as dt
    import struct as _struct

    msg = GRIB2Message(
        discipline=0, parameter_category=1, parameter_number=8,
        ref_time=dt.datetime(2024, 3, 1, 6), forecast_seconds=0,
        level_type=1, level=0, lats=np.array([1.0]), lons=np.array([2.0, 3.0]),
        values=np.array([[3.0, 4.0]]), ensemble_member=None, attrs={},
    )
    raw = bytearray(write_grib2([msg], template=template))
    # walk sections: zero the bits octet (sec 5, octet 20) and swap the
    # data section (sec 7) for an empty one, then fix the total length
    p, sec5_off, sec7_off = 16, None, None
    while p < len(raw) - 4:
        sec_len = int.from_bytes(raw[p : p + 4], "big")
        if raw[p + 4] == 5:
            sec5_off = p
        elif raw[p + 4] == 7:
            sec7_off = p
            break
        p += sec_len
    assert sec5_off is not None and sec7_off is not None
    raw[sec5_off + 19] = 0
    sec7_len = int.from_bytes(raw[sec7_off : sec7_off + 4], "big")
    empty7 = (5).to_bytes(4, "big") + bytes([7])
    raw = raw[:sec7_off] + empty7 + raw[sec7_off + sec7_len :]
    raw[8:16] = len(raw).to_bytes(8, "big")
    ref = _struct.unpack(">f", raw[sec5_off + 11 : sec5_off + 15])[0]
    dec = _struct.unpack(">h", raw[sec5_off + 17 : sec5_off + 19])[0]
    out = parse_grib2(bytes(raw))[0]
    assert np.allclose(out.values, ref / 10.0**dec)
    assert out.values.shape == (1, 2)


def test_gridstore_export_grib2_distributed(spark, tmp_path):
    """GridStore → sharded GRIB2 export (one file per time bucket, one
    message per time step, executor-side writes) → re-ingest through the
    distributed grib2 decoder path: the full migration loop, including the
    all-missing-slice skip and the uneven-axis constraint error."""
    import pandas as pd

    from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
    from zarr_climate_etl_ipfs_spark.sources.grib2 import grib2_decoder
    from zarr_climate_etl_ipfs_spark.sources.ingest import read_binary_gridded
    from zarr_climate_etl_ipfs_spark.sources.store import GridStore, StoreError

    desc = DatasetDescriptor(dataset_name="t2m", data_var="t2m", time_bucket="month")
    pdf = pd.DataFrame({
        "time": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-02-01", "2024-02-02"] * 2
        ),
        "latitude": [10.0] * 4 + [20.0] * 4,
        "longitude": [100.0] * 8,
        # 2-decimal values round-trip exactly at decimal_scale=2
        "t2m": np.arange(8, dtype="float64") / 4.0,
    })
    # an all-missing time slice: both cells NULL on 2024-02-02
    pdf.loc[pdf.time == "2024-02-02", "t2m"] = np.nan
    gs = GridStore(tmp_path / "gs", desc, spark)
    gs.write_initial(spark.createDataFrame(pdf))

    out = tmp_path / "grib"
    summary = gs.export_grib2(out, parameter=(0, 0), level_type=1)
    assert summary["files"] == 2 and summary["rows"] == 8
    assert summary["messages"] == 3 and summary["skipped_slices"] == 1
    assert sorted(p.name for p in out.iterdir()) == [
        "2024-01.grib2", "2024-02.grib2",
    ]

    jan = parse_grib2((out / "2024-01.grib2").read_bytes())
    assert len(jan) == 2
    assert [m.ref_time.day for m in jan] == [1, 2]
    # scanning mode 0: rows run N→S
    assert jan[0].lats[0] == 20.0 and jan[0].lats[-1] == 10.0
    assert jan[0].values.shape == (2, 1)

    back = read_binary_gridded(
        spark, str(out / "*.grib2"), desc, decoder=grib2_decoder(desc)
    )
    rows = {
        (str(r["time"])[:10], r["latitude"]): r["t2m"] for r in back.collect()
    }
    assert len(rows) == 6  # 3 messages x 2 cells; the all-NaN slice is gone
    assert rows[("2024-01-02", 20.0)] == 1.25
    assert rows[("2024-02-01", 10.0)] == 0.5

    with pytest.raises(StoreError, match="overwrite"):
        gs.export_grib2(out)
    assert gs.export_grib2(out, overwrite=True, template=2)["files"] == 2

    # uneven axis: section 3 stores endpoints + increment only
    desc2 = DatasetDescriptor(dataset_name="x", data_var="x", time_bucket="month")
    pdf2 = pd.DataFrame({
        "time": pd.to_datetime(["2024-01-01"] * 3),
        "latitude": [0.0, 1.0, 5.0],
        "longitude": [0.0] * 3,
        "x": [1.0, 2.0, 3.0],
    })
    gs2 = GridStore(tmp_path / "gs2", desc2, spark)
    gs2.write_initial(spark.createDataFrame(pdf2))
    with pytest.raises(GRIB2Error, match="evenly spaced"):
        gs2.export_grib2(tmp_path / "grib2b")


def test_malformed_foreign_bytes_single_exception_contract():
    """Fuzz regressions: forged section/grid/count fields must raise
    GRIB2Error — never freeze the section walk (sec_len=0), allocate a
    forged multi-GiB grid, or leak a raw numpy/struct error."""
    raw = bytearray(write_grib2([_slab()]))
    # (a) section length below the 5-octet spec floor froze the walk
    frozen = bytearray(raw)
    frozen[16:20] = (0).to_bytes(4, "big")  # section 1's length -> 0
    with pytest.raises(GRIB2Error, match="5-octet floor"):
        parse_grib2(bytes(frozen))
    # (b) forged grid dimensions must raise, not allocate
    p = 16
    while p < len(raw) - 4:
        sec_len = int.from_bytes(raw[p : p + 4], "big")
        if raw[p + 4] == 3:
            big = bytearray(raw)
            big[p + 30 : p + 34] = (2**31).to_bytes(4, "big")  # ni
            with pytest.raises(GRIB2Error, match="implausible grid"):
                parse_grib2(bytes(big))
            break
        p += sec_len
    # (c) random single-byte mutations: GRIB2Error or success, nothing else
    # (mutated scale octets legally produce inf/0-division VALUES — numpy
    # warnings are expected there; the contract under test is exceptions)
    import random as _random
    import warnings as _warnings

    rng = _random.Random(7)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", RuntimeWarning)
        for _ in range(300):
            mut = bytearray(raw)
            for _ in range(rng.randint(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            try:
                parse_grib2(bytes(mut))
            except GRIB2Error:
                pass


def test_png_packing_sub_byte_depths_unscale():
    """Template 5.41 at bits 1/2/4: decode_png applies the PNG DISPLAY
    scaling 255/(2^d−1) to sub-byte greyscale, but GRIB2 packs raw scaled
    integers X — _unpack_png must divide the exact factor back out.
    Before the r12b PNG work these depths refused cleanly; the refusal
    becoming a decode made the missing unscale a silent-corruption bug
    (caught staging the PNG upgrade)."""
    import struct
    import zlib

    import numpy as np

    from zarr_climate_etl_ipfs_spark.sources.grib2 import _unpack_png

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    def png(w, depth, scan):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 1, depth, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b"")
        )

    assert _unpack_png(png(3, 4, b"\x00\x12\x30"), 3, 4).tolist() == [1, 2, 3]
    assert _unpack_png(png(3, 1, b"\x00" + bytes([0b10100000])), 3, 1).tolist() == [1, 0, 1]
    assert _unpack_png(png(3, 2, b"\x00" + bytes([0b11_01_10_00])), 3, 2).tolist() == [3, 1, 2]
    # 8-bit stays raw (no scaling at byte depth) — regression anchor
    assert _unpack_png(png(2, 8, b"\x00\x05\xfa"), 2, 8).tolist() == [5, 250]
    # bits 5/6/7 have no legal PNG greyscale depth: encoders ship them raw
    # at depth 8; the unscale factor must come from the PNG's ACTUAL depth,
    # not the declared bits (r13 advisory — deriving it from bits=5 would
    # integer-divide 0..31 values by 8 into garbage)
    assert _unpack_png(png(3, 8, b"\x00\x1f\x00\x07"), 3, 5).tolist() == [31, 0, 7]
    assert _unpack_png(png(2, 8, b"\x00\x7f\x40"), 2, 7).tolist() == [127, 64]
    # declared bits WIDER than the payload depth cannot be represented —
    # clean refusal, never a silent mis-decode
    import pytest

    from zarr_climate_etl_ipfs_spark.sources.grib2 import GRIB2Error

    with pytest.raises(GRIB2Error, match="bit depth"):
        _unpack_png(png(3, 4, b"\x00\x12\x30"), 3, 8)
