"""GRIB1 reader/writer + real-bytes ingest (S8; the reference scans GRIB via
kerchunk, utils/transform.py:19, 211-253 — here decoded from the published
WMO FM 92-VIII edition-1 spec)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.sources.grib1 import (
    GRIB1Error,
    GRIB1Message,
    float_to_ibm,
    grib1_decoder,
    ibm_to_float,
    parse_grib1,
    write_grib1,
)
from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize, read_binary_gridded
from zarr_climate_etl_ipfs_spark.sources.store import GridStore


def _slab(nj=4, ni=5, seed=0, t0=dt.datetime(2021, 9, 16), holes=False):
    rng = np.random.RandomState(seed)
    vals = np.round(rng.uniform(0, 50, (nj, ni)), 2)
    if holes:
        vals[0, 0] = np.nan
        vals[2, 3] = np.nan
    return GRIB1Message(
        parameter=61,  # precipitation
        level_type=1,
        level=0,
        ref_time=t0,
        lats=np.linspace(40.0, 10.0, nj),
        lons=np.linspace(100.0, 140.0, ni),
        values=vals,
    )


def test_ibm_float_roundtrip():
    for v in (0.0, 1.0, -1.0, 3.14159, 1e-3, -2.5e4, 65535.0, 7.62939453125e-06):
        got = ibm_to_float(float_to_ibm(v))
        assert got == pytest.approx(v, rel=1e-6), v


def test_roundtrip_simple_packing():
    msg = _slab()
    content = write_grib1([msg], bits_per_value=16, decimal_scale=2)
    out = parse_grib1(content)
    assert len(out) == 1
    got = out[0]
    assert got.parameter == 61 and got.level == 0
    assert got.ref_time == msg.ref_time
    np.testing.assert_allclose(got.lats, msg.lats, atol=1e-3)
    np.testing.assert_allclose(got.lons, msg.lons, atol=1e-3)
    # 2-decimal data packed at decimal scale 2 into 16 bits is exact
    np.testing.assert_allclose(got.values, msg.values, atol=1e-9)


def test_roundtrip_bitmap_masks_missing():
    msg = _slab(holes=True)
    content = write_grib1([msg])
    got = parse_grib1(content)[0]
    assert np.isnan(got.values[0, 0]) and np.isnan(got.values[2, 3])
    mask = ~np.isnan(msg.values)
    np.testing.assert_allclose(got.values[mask], msg.values[mask], atol=1e-9)


def test_multi_message_and_odd_bit_width():
    msgs = [
        _slab(seed=1, t0=dt.datetime(2021, 9, 16)),
        _slab(seed=2, t0=dt.datetime(2021, 9, 17)),
    ]
    content = write_grib1(msgs, bits_per_value=12, decimal_scale=1)
    out = parse_grib1(content)
    assert [m.ref_time.day for m in out] == [16, 17]
    for got, want in zip(out, msgs):
        # 1-decimal data in 12 bits: within half a pack step
        np.testing.assert_allclose(got.values, want.values, atol=0.06)


def test_parse_rejects_non_grib():
    with pytest.raises(GRIB1Error, match="not a GRIB1"):
        parse_grib1(b"\x89HDF\r\n\x1a\n definitely hdf5")


@pytest.fixture
def gb_desc():
    return DatasetDescriptor(
        dataset_name="gb_obs",
        data_var="precip",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2021, 9, 16),
        missing_value=-9999.0,
        time_bucket="month",
    )


def test_ingest_real_grib1_bytes_end_to_end(spark, tmp_path, gb_desc):
    """GRIB1 files on disk → distributed binaryFile ingest → canonicalize →
    store write → point read-back within packing precision."""
    m1 = _slab(seed=3, t0=dt.datetime(2021, 9, 16))
    m2 = _slab(seed=4, t0=dt.datetime(2021, 9, 17), holes=True)
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "f_2021-09-16.grib1").write_bytes(write_grib1([m1]))
    (tmp_path / "in" / "f_2021-09-17.grib1").write_bytes(write_grib1([m2]))

    raw = read_binary_gridded(
        spark,
        str(tmp_path / "in" / "*.grib1"),
        gb_desc,
        decoder=grib1_decoder(gb_desc),
        extensions=["grib1"],
    )
    canon = canonicalize(raw, gb_desc)
    store = GridStore(tmp_path / "store", gb_desc, spark)
    store.write_initial(canon)

    ds = store.dataset()
    assert ds.count() == 2 * 4 * 5
    got = ds.filter(
        (F.col("time") == dt.datetime(2021, 9, 16))
        & (F.col("latitude") == 20.0)
        & (F.col("longitude") == 110.0)
    ).collect()
    assert len(got) == 1
    assert got[0]["precip"] == pytest.approx(m1.values[2, 1], abs=1e-4)
    # the bitmap-masked cell arrives as NULL
    hole = ds.filter(
        (F.col("time") == dt.datetime(2021, 9, 17))
        & (F.col("latitude") == 40.0)
        & (F.col("longitude") == 100.0)
    ).collect()
    assert len(hole) == 1 and hole[0]["precip"] is None


def test_malformed_foreign_bytes_single_exception_contract():
    """Mutation fuzz (the grib2/blosc hardening bar): forged octets must
    raise GRIB1Error — never a raw struct/numpy/datetime error, and the
    two forged 16-bit grid counts must not size a 34 GiB np.full (ni*nj
    capped at 2^28, grib2's _MAX_POINTS bound). An 8000-trial sweep ran
    clean when this landed; 1500 trials stay as the regression net."""
    import random as _random
    import warnings as _warnings

    from zarr_climate_etl_ipfs_spark.sources.grib1 import GRIB1Error

    raw = write_grib1([_slab(nj=2, ni=3, seed=1)], bits_per_value=16, decimal_scale=2)
    rng = _random.Random(7)
    # mutated scale/heap octets legally produce inf/0-division values
    # and tolerated-attr skips - the contract under test is exceptions
    _warnings.simplefilter('ignore')
    for trial in range(1500):
        mut = bytearray(raw)
        for _ in range(rng.randint(1, 6)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        if trial % 5 == 0:
            mut = mut[: rng.randrange(5, len(mut))]
        try:
            parse_grib1(bytes(mut))
        except GRIB1Error:
            pass
