"""Pure-numpy HDF5/NetCDF4 reader (S7; reference utils/transform.py:204-209
ingests NetCDF4 via kerchunk/h5py — here decoded from the published HDF5 spec)
exercised against the reference's own system fixtures
(tests/system/data/*.nc), which are real netCDF4 files written by xarray.
"""

from __future__ import annotations

import datetime as dt
import glob
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.sources.hdf5 import (
    HDF5Error,
    netcdf4_decoder,
    parse_hdf5,
)
from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize, read_binary_gridded
from zarr_climate_etl_ipfs_spark.sources.store import GridStore

FIXTURE_DIR = Path("/root/reference/tests/system/data")

pytestmark = pytest.mark.skipif(
    not FIXTURE_DIR.is_dir(), reason="reference HDF5 fixtures not available"
)


def _fixture(name: str) -> bytes:
    return (FIXTURE_DIR / name).read_bytes()


def test_parse_rejects_non_hdf5():
    with pytest.raises(HDF5Error, match="not an HDF5"):
        parse_hdf5(b"CDF\x01 this is netcdf3, not hdf5")


def test_all_reference_fixtures_parse():
    """Every system fixture opens: compact-link v2 headers (append subsets)
    and v1 symbol-table groups + indirect fractal heaps (initial datasets)."""
    paths = sorted(glob.glob(str(FIXTURE_DIR / "*.nc")))
    assert len(paths) >= 6
    for p in paths:
        h5 = parse_hdf5(Path(p).read_bytes())
        assert {"time", "latitude", "longitude", "precip"} <= set(h5.variables)
        nt = h5.variables["time"].shape[0]
        assert h5.variables["precip"].shape == (nt, 8, 8)


def test_initial_dataset_values_and_attrs():
    """Chunked + deflate float32 data decodes to plausible CHIRPS values,
    with CF time units and the 0.25° grid the reference tests assert on."""
    h5 = parse_hdf5(_fixture("chirps_initial_dataset.nc"))
    lat = h5.read("latitude")
    lon = h5.read("longitude")
    np.testing.assert_allclose(np.diff(lat), 0.25)
    np.testing.assert_allclose(np.diff(lon), 0.25)
    assert h5.variables["time"].attrs["units"] == "days since 1980-01-01"
    precip = h5.read("precip")
    assert precip.dtype == np.float32
    assert precip.shape == (44, 8, 8)
    # −9999 sentinel plus real precip magnitudes
    assert float(precip.min()) == -9999.0
    real = precip[precip > -9999.0]
    assert 0.0 <= float(real.min()) and float(real.max()) < 1000.0


def test_v2_builtin_filter_description_offsets():
    """v2 filter-pipeline descriptions of builtin filters (id < 256) have no
    Name Length field: Flags sits at +2 and the client-value count at +4.
    Regression: the old reader took the v1 offsets and parsed deflate as
    (1, (0, 0, 0, 0, 0)); the real description is (1, (level,)). Benign for
    deflate (client values unused) but fatal for shuffle, whose element size
    is vals[0]."""
    h5 = parse_hdf5(_fixture("chirps_initial_dataset_smaller.nc"))
    filters = h5.variables["precip"].filters
    assert filters == ((1, (5,)),), filters


def test_unreadable_attribute_skipped_with_warning():
    """Attribute tolerance: a message the subset reader cannot decode (here
    an unknown attribute version, the same path a newer-h5py VLEN attr
    takes) is warn-skipped; it must not fail the object."""
    from zarr_climate_etl_ipfs_spark.sources.hdf5 import _MSG_ATTRIBUTE, _collect_attrs

    good = bytes([1, 0, 3, 0, 8, 0, 8, 0])  # v1 header: name=3, dt=8, ds=8
    good += b"ok\x00" + b"\x00" * 5  # name padded to 8
    good += bytes([0x10, 0x08, 0, 0, 4, 0, 0, 0])  # fixed-point dt, 4 bytes
    good += bytes([1, 0, 0, 0, 0, 0, 0, 0])  # v1 dataspace rank 0
    good += (7).to_bytes(4, "little")
    bad = bytes([9]) + b"\x00" * 11  # attribute message v9 — unknown
    content = good + bad
    with pytest.warns(UserWarning, match="unreadable HDF5 attribute"):
        attrs = _collect_attrs(
            content,
            [(_MSG_ATTRIBUTE, 0, len(good)), (_MSG_ATTRIBUTE, len(good), len(bad))],
        )
    assert attrs == {"ok": 7}


def test_append_subset_coordinates():
    """v2-superblock files (compact links, dense attributes in a fractal
    heap): int32 time coordinate and float32 axes decode exactly."""
    h5 = parse_hdf5(_fixture("chirps_append_subset_0.nc"))
    t = h5.read("time")
    assert t.dtype == np.int32
    np.testing.assert_array_equal(np.diff(t), 1)
    assert h5.read("latitude").dtype == np.float32
    assert "units" in h5.variables["time"].attrs


@pytest.fixture
def h5_desc():
    return DatasetDescriptor(
        dataset_name="chirps_h5",
        data_var="precip",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2003, 1, 1),
        missing_value=-9999.0,
        time_bucket="month",
    )


def test_ingest_real_hdf5_bytes_end_to_end(spark, tmp_path, h5_desc):
    """Real netCDF4 fixture bytes → binaryFile ingest with the HDF5 decoder →
    canonicalize → store write → point read-back equals the direct array."""
    name = "chirps_initial_dataset_smaller.nc"
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / name).write_bytes(_fixture(name))

    h5 = parse_hdf5(_fixture(name))
    precip = h5.read("precip")
    times = h5.read("time").astype("float64")
    lats = h5.read("latitude")
    lons = h5.read("longitude")

    raw = read_binary_gridded(
        spark,
        str(tmp_path / "in" / "*.nc"),
        h5_desc,
        decoder=netcdf4_decoder(h5_desc),
    )
    canon = canonicalize(raw, h5_desc)
    store = GridStore(tmp_path / "store", h5_desc, spark)
    store.write_initial(canon)

    ds = store.dataset()
    assert ds.count() == precip.size

    ti, yi, xi = 3, 2, 5
    when = dt.datetime(1980, 1, 1) + dt.timedelta(days=float(times[ti]))
    got = ds.filter(
        (F.col("time") == when)
        & (F.col("latitude") == float(np.float32(lats[yi])))
        & (F.col("longitude") == float(np.float32(lons[xi])))
    ).collect()
    assert len(got) == 1
    want = float(precip[ti, yi, xi])
    if want == -9999.0:
        assert got[0]["precip"] is None
    else:
        assert got[0]["precip"] == pytest.approx(want, abs=1e-6)


def test_decoder_rejects_missing_variable(h5_desc):
    decode = netcdf4_decoder(h5_desc, data_var="nope")
    with pytest.raises(HDF5Error, match="not in file"):
        decode("x.nc", _fixture("chirps_append_subset_0.nc"))
