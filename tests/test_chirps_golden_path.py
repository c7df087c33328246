"""Reference golden-path E2E on the reference's OWN fixture bytes.

Mirrors tests/system/test_chirps.py verbatim-shape: ingest real netCDF4
fixture bytes → initial publish → append update → in-place insert → point
value equality at (latitude 14.625, longitude -91.375), plus the
hole-append negative (test_chirps.py:293-313). The reference drives this
through xarray/zarr/IPLD; here the same lifecycle runs through
read_binary_gridded + GridStore, and every expected value is decoded
directly from the same fixture by the pure-numpy HDF5 reader.

Fixture notes (reference tests/system/data/):
- chirps_initial_dataset.nc      44 daily steps 2003-04-02..2003-05-15
- chirps_append_subset_{0,1}.nc  16 steps each, 2003-05-16..31 / 06-01..16
  (CF epoch "days since 1900-01-01" — the decoder reads per-file units)
- chirps_append_subset_with_hole.nc  14 steps in 05-16..30, two missing
- chirps_qc_test_2003041100.nc   re-issue of the initial 44 steps (insert)
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.sources.hdf5 import netcdf4_decoder, parse_hdf5
from zarr_climate_etl_ipfs_spark.sources.ingest import canonicalize, read_binary_gridded
from zarr_climate_etl_ipfs_spark.sources.store import GridStore, StoreError

FIXTURE_DIR = Path("/root/reference/tests/system/data")

pytestmark = pytest.mark.skipif(
    not FIXTURE_DIR.is_dir(), reason="reference HDF5 fixtures not available"
)

LAT, LON = 14.625, -91.375  # the reference's probe point (test_chirps.py:219)


def _desc(allow_overwrite: bool = False) -> DatasetDescriptor:
    return DatasetDescriptor(
        dataset_name="chirps_golden",
        data_var="precip",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2003, 1, 1),
        missing_value=-9999.0,
        time_bucket="month",
        allow_overwrite=allow_overwrite,
    )


def _fixture_value(name: str, when: dt.datetime) -> float:
    """Decode (LAT, LON, when) straight from the fixture bytes — the same
    role xarray.open_dataset(...).sel(...) plays in the reference test."""
    h5 = parse_hdf5((FIXTURE_DIR / name).read_bytes())
    times = h5.read("time").astype("float64")
    units = h5.variables["time"].attrs["units"]
    epoch = dt.datetime.strptime(units.removeprefix("days since ").strip(), "%Y-%m-%d")
    ti = int(np.where(times == (when - epoch).days)[0][0])
    yi = int(np.where(np.isclose(h5.read("latitude"), LAT))[0][0])
    xi = int(np.where(np.isclose(h5.read("longitude"), LON))[0][0])
    return float(h5.read("precip")[ti, yi, xi])


def _ingest(spark, tmp_path, desc, names: list[str], sub: str):
    d = tmp_path / sub
    d.mkdir()
    for n in names:
        (d / n).write_bytes((FIXTURE_DIR / n).read_bytes())
    raw = read_binary_gridded(
        spark, str(d / "*.nc"), desc, decoder=netcdf4_decoder(desc)
    )
    return canonicalize(raw, desc)


def _point(store: GridStore, when: dt.datetime):
    rows = (
        store.dataset()
        .filter(
            (F.col("time") == when)
            & (F.col("latitude") == np.float32(LAT))
            & (F.col("longitude") == np.float32(LON))
        )
        .collect()
    )
    assert len(rows) == 1, f"expected exactly one row at probe point, got {rows}"
    return rows[0]["precip"]


def test_golden_path_initial_append_insert(spark, tmp_path):
    desc = _desc(allow_overwrite=True)
    store = GridStore(tmp_path / "store", desc, spark)

    # -- initial publish (test_chirps.py test_initial:192-235)
    store.write_initial(_ingest(spark, tmp_path, desc, ["chirps_initial_dataset.nc"], "ini"))
    when = dt.datetime(2003, 5, 12)
    want = _fixture_value("chirps_initial_dataset.nc", when)
    assert _point(store, when) == pytest.approx(want, abs=1e-5)
    assert store.dataset().count() == 44 * 8 * 8

    # -- append-only update (test_append_only:258-291, probe 2003-05-25)
    res = store.update(
        _ingest(
            spark, tmp_path, desc,
            ["chirps_append_subset_0.nc", "chirps_append_subset_1.nc"], "app",
        )
    )
    assert res == {"inserts": 0, "appends": 32}
    when = dt.datetime(2003, 5, 25)
    want = _fixture_value("chirps_append_subset_0.nc", when)
    got = _point(store, when)
    if want == -9999.0:
        assert got is None
    else:
        assert got == pytest.approx(want, rel=1e-6)
    assert store.dataset().count() == (44 + 32) * 8 * 8

    # -- in-place insert: the QC re-issue covers existing steps only
    res = store.update(
        _ingest(spark, tmp_path, desc, ["chirps_qc_test_2003041100.nc"], "qc")
    )
    assert res == {"inserts": 44, "appends": 0}
    when = dt.datetime(2003, 4, 11)
    want = _fixture_value("chirps_qc_test_2003041100.nc", when)
    assert _point(store, when) == pytest.approx(want, abs=1e-5)
    # inserts replace whole time slices; total row count is unchanged
    assert store.dataset().count() == (44 + 32) * 8 * 8
    # three manifest versions: initial, append, insert
    assert [v["action"] for v in store.versions()] == ["initial", "append", "insert"]
    store.verify_integrity()


def test_hole_append_rejected(spark, tmp_path):
    """test_chirps.py test_bad_append:293-313 — an update whose append set
    has internal gaps must be refused before any write."""
    desc = _desc()
    store = GridStore(tmp_path / "store", desc, spark)
    store.write_initial(_ingest(spark, tmp_path, desc, ["chirps_initial_dataset.nc"], "ini"))
    hole = _ingest(spark, tmp_path, desc, ["chirps_append_subset_with_hole.nc"], "hole")
    with pytest.raises(StoreError, match="internal gaps"):
        store.update(hole)
    # nothing was committed
    assert [v["action"] for v in store.versions()] == ["initial"]
