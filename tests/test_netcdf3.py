"""NetCDF3 reader/writer + real-bytes ingest (S7; reference
utils/transform.py:204-273 and the golden system test
tests/system/test_chirps.py:192-235)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize, read_binary_gridded
from zarr_climate_etl_ipfs_spark.sources.netcdf3 import (
    NetCDF3Error,
    netcdf3_decoder,
    parse_netcdf3,
    write_netcdf3,
)
from zarr_climate_etl_ipfs_spark.sources.store import GridStore


def _grid_file(
    n_days: int, lats, lons, seed: int, t0_days: float = 0.0, record_dim: str | None = None
) -> tuple[bytes, np.ndarray]:
    rng = np.random.RandomState(seed)
    data = rng.standard_normal((n_days, len(lats), len(lons))).astype("float32")
    content = write_netcdf3(
        dims={"time": n_days, "latitude": len(lats), "longitude": len(lons)},
        variables={
            "time": (("time",), np.arange(t0_days, t0_days + n_days, dtype="float64"),
                     {"units": "days since 2021-09-16 00:00:00"}),
            "latitude": (("latitude",), np.asarray(lats, dtype="float64"), {}),
            "longitude": (("longitude",), np.asarray(lons, dtype="float64"), {}),
            "precip": (("time", "latitude", "longitude"), data,
                       {"units": "mm", "_FillValue": np.float32(-9999.0)}),
        },
        global_attrs={"title": "fixture", "Conventions": "CF-1.6"},
        record_dim=record_dim,
    )
    return content, data


def test_roundtrip_fixed_dims():
    content, data = _grid_file(3, [10.0, 20.0], [100.0, 110.0, 120.0], seed=1)
    nc = parse_netcdf3(content)
    assert nc.dimensions == {"time": 3, "latitude": 2, "longitude": 3}
    assert nc.record_dim is None
    assert nc.attrs["title"] == "fixture"
    assert nc.variables["precip"].attrs["units"] == "mm"
    assert nc.variables["precip"].attrs["_FillValue"] == pytest.approx(-9999.0)
    np.testing.assert_array_equal(nc.read("precip"), data)
    np.testing.assert_array_equal(nc.read("time"), np.arange(3.0))
    np.testing.assert_array_equal(nc.read("latitude"), [10.0, 20.0])


def test_roundtrip_record_dim():
    """Unlimited time dim: record variables interleave per record; the
    reader must de-interleave (including the one-record-var padding rule)."""
    content, data = _grid_file(4, [0.0, 5.0], [30.0, 40.0], seed=2, record_dim="time")
    nc = parse_netcdf3(content)
    assert nc.record_dim == "time"
    assert nc.numrecs == 4
    assert nc.dimensions["time"] == 4
    np.testing.assert_array_equal(nc.read("precip"), data)
    np.testing.assert_array_equal(nc.read("time"), np.arange(4.0))


def test_roundtrip_odd_sized_types():
    """int16 slabs force 4-byte padding; scalars and int32 coords survive."""
    content = write_netcdf3(
        dims={"x": 3},
        variables={
            "s": (("x",), np.array([1, -2, 3], dtype="int16"), {}),
            "i": (("x",), np.array([7, 8, 9], dtype="int32"), {}),
            "c": ((), np.float64(2.5), {}),
        },
    )
    nc = parse_netcdf3(content)
    np.testing.assert_array_equal(nc.read("s"), [1, -2, 3])
    np.testing.assert_array_equal(nc.read("i"), [7, 8, 9])
    assert nc.read("c") == pytest.approx(2.5)


def test_parse_rejects_non_netcdf():
    with pytest.raises(NetCDF3Error, match="not a NetCDF3"):
        parse_netcdf3(b"PK\x03\x04 definitely a zip")


@pytest.fixture
def nc_desc():
    return DatasetDescriptor(
        dataset_name="nc_obs",
        data_var="precip",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2021, 9, 16),
        missing_value=-9999.0,
        time_bucket="month",
    )


def test_ingest_real_netcdf_bytes_end_to_end(spark, tmp_path, nc_desc):
    """The golden path (test_chirps.py:192-235): real NetCDF3 files on disk →
    distributed binaryFile ingest → canonicalize → initial store write →
    exact float32 point read-back against the source array."""
    lats, lons = [10.0, 20.0], [100.0, 110.0]
    c1, d1 = _grid_file(3, lats, lons, seed=3, t0_days=0.0, record_dim="time")
    c2, d2 = _grid_file(2, lats, lons, seed=4, t0_days=3.0)  # fixed-dim file
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "f_2021-09-16.nc").write_bytes(c1)
    (tmp_path / "in" / "f_2021-09-19.nc").write_bytes(c2)

    raw = read_binary_gridded(
        spark, str(tmp_path / "in" / "*.nc"), nc_desc, decoder=netcdf3_decoder(nc_desc)
    )
    canon = canonicalize(raw, nc_desc)
    store = GridStore(tmp_path / "store", nc_desc, spark)
    store.write_initial(canon)

    ds = store.dataset()
    assert ds.count() == (3 + 2) * len(lats) * len(lons)
    # exact float32 equality for a cell from each file
    got1 = ds.filter(
        (F.col("time") == dt.datetime(2021, 9, 17))
        & (F.col("latitude") == 20.0)
        & (F.col("longitude") == 110.0)
    ).collect()
    assert len(got1) == 1 and got1[0]["precip"] == d1[1, 1, 1]
    got2 = ds.filter(
        (F.col("time") == dt.datetime(2021, 9, 20))
        & (F.col("latitude") == 10.0)
        & (F.col("longitude") == 100.0)
    ).collect()
    assert len(got2) == 1 and got2[0]["precip"] == d2[1, 0, 0]


def test_ingest_masks_sentinel_from_file(spark, tmp_path, nc_desc):
    data = np.full((1, 1, 2), 5.0, dtype="float32")
    data[0, 0, 1] = -9999.0
    content = write_netcdf3(
        dims={"time": 1, "latitude": 1, "longitude": 2},
        variables={
            "time": (("time",), np.array([0.0]), {"units": "days since 2021-09-16"}),
            "latitude": (("latitude",), np.array([10.0]), {}),
            "longitude": (("longitude",), np.array([100.0, 110.0]), {}),
            "precip": (("time", "latitude", "longitude"), data, {}),
        },
    )
    (tmp_path / "one.nc").write_bytes(content)
    raw = read_binary_gridded(
        spark, str(tmp_path / "one.nc"), nc_desc, decoder=netcdf3_decoder(nc_desc)
    )
    out = canonicalize(raw, nc_desc).orderBy("longitude").collect()
    assert out[0]["precip"] == 5.0
    assert out[1]["precip"] is None  # sentinel → NULL (F6)


def test_ingest_file_subset_predicates(spark, tmp_path, nc_desc):
    """P8 (utils/transform.py:74-86): substring filters and extension
    whitelist applied on the path column, before content decode."""
    c1, _ = _grid_file(1, [10.0], [100.0], seed=5, t0_days=0.0)
    c2, _ = _grid_file(1, [10.0], [100.0], seed=6, t0_days=1.0)
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "chirps_2021-09-16.nc").write_bytes(c1)
    (tmp_path / "in" / "era5_2021-09-17.nc").write_bytes(c2)
    (tmp_path / "in" / "readme.txt").write_bytes(b"not data")

    def read(**kw):
        return read_binary_gridded(
            spark, str(tmp_path / "in" / "*"), nc_desc,
            decoder=netcdf3_decoder(nc_desc), **kw,
        )

    # extension whitelist keeps the .txt file out of the decoder entirely
    assert read(extensions=["nc"]).count() == 2
    # substring membership (OR across filters), composed with the whitelist
    assert read(extensions=[".nc"], file_filters=["chirps"]).count() == 1
    assert read(extensions=[".nc"], file_filters=["chirps", "era5"]).count() == 2


def test_malformed_foreign_bytes_single_exception_contract():
    """Mutation fuzz (the grib2/blosc hardening bar): forged tags, counts,
    offsets and dim sizes must raise NetCDF3Error — never a raw struct/
    numpy/unicode error, a numrecs-driven spin, or a forged-shape
    allocation (np.prod would wrap int64 on 2^31 x 2^31; read() computes
    exact int products and caps against the buffer). 8000-trial sweeps of
    both corpora ran clean when this landed; the committed loop keeps a
    1500-trial regression net per corpus."""
    import random as _random
    import warnings as _warnings

    fixed = write_netcdf3(
        {"time": 5, "latitude": 2, "longitude": 2},
        {
            "time": (("time",), np.arange(5, dtype=np.int32),
                     {"units": "days since 2021-01-01"}),
            "latitude": (("latitude",), np.array([10.0, 20.0], np.float32), {}),
            "data": (("time", "latitude", "longitude"),
                     np.arange(20, dtype=np.float32).reshape(5, 2, 2), {}),
        },
    )
    record = write_netcdf3(
        {"time": 5, "latitude": 2, "longitude": 2},
        {
            "time": (("time",), np.arange(5, dtype=np.int32), {}),
            "data": (("time", "latitude", "longitude"),
                     np.arange(20, dtype=np.float32).reshape(5, 2, 2), {}),
        },
        record_dim="time",
    )
    rng = _random.Random(7)
    # mutated scale/heap octets legally produce inf/0-division values
    # and tolerated-attr skips - the contract under test is exceptions
    _warnings.simplefilter('ignore')
    for raw in (fixed, record):
        for trial in range(1500):
            mut = bytearray(raw)
            for _ in range(rng.randint(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            if trial % 5 == 0:
                mut = mut[: rng.randrange(4, len(mut))]
            try:
                f = parse_netcdf3(bytes(mut))
                for nm in f.variables:
                    f.read(nm)
            except NetCDF3Error:
                pass
