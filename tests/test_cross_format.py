"""Cross-format ingest equivalence: one synthetic grid written as NetCDF3,
GRIB1 and GRIB2 must canonicalize to bit-identical tall tables (2-decimal
data at decimal scale 2 packs losslessly, so even the lossy GRIB path is
exact here). This pins the decoder contracts against each other — a
latitude-order or time-origin slip in any one reader breaks the join."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.sources.grib1 import GRIB1Message, grib1_decoder, write_grib1
from zarr_climate_etl_ipfs_spark.sources.grib2 import GRIB2Message, grib2_decoder, write_grib2
from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize, read_binary_gridded
from zarr_climate_etl_ipfs_spark.sources.netcdf3 import netcdf3_decoder, write_netcdf3


@pytest.fixture
def xf_desc():
    return DatasetDescriptor(
        dataset_name="xf",
        data_var="precip",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2021, 9, 16),
        time_bucket="month",
    )


def test_three_formats_one_table(spark, tmp_path, xf_desc):
    lats = np.linspace(40.0, 10.0, 4)
    lons = np.linspace(100.0, 140.0, 5)
    days = [dt.datetime(2021, 9, 16), dt.datetime(2021, 9, 17)]
    rng = np.random.RandomState(21)
    data = np.round(rng.uniform(0, 60, (2, 4, 5)), 2).astype("float32")

    nc = write_netcdf3(
        dims={"time": 2, "latitude": 4, "longitude": 5},
        variables={
            "time": (("time",), np.array([0.0, 1.0]), {"units": "days since 2021-09-16"}),
            "latitude": (("latitude",), lats.astype("float64"), {}),
            "longitude": (("longitude",), lons.astype("float64"), {}),
            "precip": (("time", "latitude", "longitude"), data, {}),
        },
    )
    g1 = write_grib1(
        [
            GRIB1Message(parameter=61, level_type=1, level=0, ref_time=t,
                         lats=lats, lons=lons, values=data[i].astype("float64"))
            for i, t in enumerate(days)
        ],
        bits_per_value=16, decimal_scale=2,
    )
    g2msgs = [
        GRIB2Message(discipline=0, parameter_category=1, parameter_number=8,
                     level_type=1, level=0, ref_time=t,
                     lats=lats, lons=lons, values=data[i].astype("float64"))
        for i, t in enumerate(days)
    ]
    g2 = write_grib2(g2msgs, bits_per_value=16, decimal_scale=2)
    # same grid, complex packing with 2nd-order spatial differencing (5.3) —
    # the encoding real ERA5/GFS feeds use; must canonicalize identically
    g2c = write_grib2(g2msgs, decimal_scale=2, template=3, diff_order=2)
    for name, payload in (
        ("a.nc", nc), ("a.grib1", g1), ("a.grib2", g2), ("a.grib2c", g2c)
    ):
        d = tmp_path / name.split(".")[-1]
        d.mkdir()
        (d / name).write_bytes(payload)

    def load(sub, decoder):
        raw = read_binary_gridded(spark, str(tmp_path / sub / "*"), xf_desc, decoder=decoder)
        return canonicalize(raw, xf_desc)

    t_nc = load("nc", netcdf3_decoder(xf_desc))
    t_g1 = load("grib1", grib1_decoder(xf_desc))
    t_g2 = load("grib2", grib2_decoder(xf_desc))
    t_g2c = load("grib2c", grib2_decoder(xf_desc))

    key = ["time", "latitude", "longitude"]
    assert t_nc.count() == 2 * 4 * 5
    for other, label in (
        (t_g1, "grib1"), (t_g2, "grib2"), (t_g2c, "grib2-complex-5.3")
    ):
        j = t_nc.alias("a").join(other.alias("b"), key)
        assert j.count() == 2 * 4 * 5, label
        # bit-identical float32 values in every cell
        mism = j.filter(F.col("a.precip") != F.col("b.precip")).count()
        assert mism == 0, label
