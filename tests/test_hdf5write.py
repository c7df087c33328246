"""HDF5 writer (sources/hdf5write.py) validated through the reader that
golden-decodes the reference's own h5py-written fixtures — contiguous
and chunked+shuffle+deflate layouts, v1 attribute messages, netCDF4
dimension scales with a real vlen-object-reference DIMENSION_LIST, and
the full S7 loop (written bytes → netcdf4_decoder → tall rows)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from zarr_climate_etl_ipfs_spark.sources.hdf5 import HDF5Error, parse_hdf5
from zarr_climate_etl_ipfs_spark.sources.hdf5write import write_hdf5


def _grid(nt=5, ny=4, nx=6, dtype="<f4"):
    return {
        "time": (("time",), np.arange(nt, dtype="<f8"), {"units": "days since 2020-01-01"}),
        "latitude": (("latitude",), np.linspace(10, 20, ny), {}),
        "longitude": (("longitude",), np.linspace(100, 110, nx), {}),
        "precip": (
            ("time", "latitude", "longitude"),
            np.arange(nt * ny * nx, dtype=dtype).reshape(nt, ny, nx),
            {"units": "mm"},
        ),
    }


def test_contiguous_roundtrip():
    v = _grid()
    h5 = parse_hdf5(write_hdf5(v))
    assert sorted(h5.variables) == ["latitude", "longitude", "precip", "time"]
    for nm in v:
        assert (h5.read(nm) == np.asarray(v[nm][1])).all()
        assert h5.read(nm).dtype == np.asarray(v[nm][1]).dtype.newbyteorder("=")


@pytest.mark.parametrize("compress", [None, 1, 6])
def test_chunked_roundtrip_with_edge_chunks(compress):
    v = _grid(nt=5, ny=4, nx=6)
    blob = write_hdf5(v, chunks={"precip": (2, 3, 4)}, compress=compress)
    h5 = parse_hdf5(blob)
    assert (h5.read("precip") == v["precip"][1]).all()
    filt = h5.variables["precip"].filters
    if compress is None:
        assert filt == ()
    else:  # shuffle (elem size) then deflate (level)
        assert filt == ((2, (4,)), (1, (compress,)))


@pytest.mark.parametrize("dtype", ["<f4", "<f8", "<i2", "<i4", "<i8", "<u1", "<u4"])
def test_dtypes(dtype):
    arr = np.arange(24).astype(dtype).reshape(4, 6)
    h5 = parse_hdf5(write_hdf5({"v": (("a", "b"), arr, {})}))
    back = h5.read("v")
    assert back.dtype == np.dtype(dtype) and (back == arr).all()


def test_attributes_all_shapes():
    attrs = {
        "s": "a string",
        "i": 42,
        "f": 2.75,
        "vec": np.array([1.5, 2.5], dtype="<f8"),
        "ints": [7, 8, 9],
    }
    h5 = parse_hdf5(
        write_hdf5({"v": (("a",), np.zeros(3), attrs)}, global_attrs={"title": "t"})
    )
    a = h5.variables["v"].attrs
    assert a["s"] == "a string" and a["i"] == 42 and a["f"] == 2.75
    assert a["vec"] == [1.5, 2.5] and a["ints"] == [7, 8, 9]
    assert h5.attrs["title"] == "t"
    assert h5.attrs["_NCProperties"].startswith("version=2")


def test_dimension_scales_and_dimension_list():
    h5 = parse_hdf5(write_hdf5(_grid()))
    assert h5.variables["time"].attrs["CLASS"] == "DIMENSION_SCALE"
    assert h5.variables["time"].attrs["NAME"] == "time"
    assert "CLASS" not in h5.variables["precip"].attrs
    # the vlen-object-reference list resolves through the reader's
    # fixture-validated global-heap machinery to the scale names
    assert h5.variables["precip"].attrs["DIMENSION_LIST"] == [
        ["time"], ["latitude"], ["longitude"]
    ]


def test_dimension_scales_off():
    h5 = parse_hdf5(write_hdf5(_grid(), dimension_scales=False))
    assert "CLASS" not in h5.variables["time"].attrs
    assert "DIMENSION_LIST" not in h5.variables["precip"].attrs
    assert "_NCProperties" not in h5.attrs


def test_many_variables_one_snod():
    v = {f"v{i:02d}": (("x",), np.arange(3, dtype="<f8") + i, {}) for i in range(20)}
    h5 = parse_hdf5(write_hdf5(v))
    assert len(h5.variables) == 20
    assert h5.read("v07")[0] == 7.0


def test_scalar_edgecases_and_errors():
    h5 = parse_hdf5(write_hdf5({"one": (("x",), np.array([3.5]), {})}))
    assert h5.read("one")[0] == 3.5
    with pytest.raises(HDF5Error, match="dims"):
        write_hdf5({"v": (("a", "b"), np.zeros(3), {})})
    with pytest.raises(HDF5Error, match="conflicting"):
        write_hdf5({
            "a": (("x",), np.zeros(3), {}),
            "b": (("x",), np.zeros(4), {}),
        })
    with pytest.raises(HDF5Error, match="numeric"):
        write_hdf5({"v": (("x",), np.array(["a", "b"]), {})})


def test_netcdf4_decoder_full_loop():
    """S7 loop: bytes this writer emits decode through the same
    netcdf4_decoder the ingest path uses for real NetCDF4 files."""
    from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
    from zarr_climate_etl_ipfs_spark.sources.hdf5 import netcdf4_decoder

    desc = DatasetDescriptor(dataset_name="precip", data_var="precip")
    blob = write_hdf5(_grid(nt=3, ny=2, nx=2), chunks={"precip": (1, 2, 2)}, compress=4)
    pdf = netcdf4_decoder(desc)("mem.nc", blob)
    assert len(pdf) == 12
    assert pdf["precip"].iloc[-1] == 11.0
    assert str(pdf["time"].iloc[0])[:10] == "2020-01-01"


@given(
    shape=st.tuples(st.integers(1, 7), st.integers(1, 7), st.integers(1, 5)),
    cdiv=st.tuples(st.integers(1, 3), st.integers(1, 3), st.integers(1, 3)),
    level=st.sampled_from([None, 1, 9]),
    dtype=st.sampled_from(["<f4", "<f8", "<i4"]),
)
@settings(max_examples=40, deadline=None)
def test_chunk_property_roundtrip(shape, cdiv, level, dtype):
    arr = (np.arange(int(np.prod(shape))) % 97).astype(dtype).reshape(shape)
    cs = tuple(max(1, s // d) for s, d in zip(shape, cdiv))
    blob = write_hdf5(
        {"v": (("a", "b", "c"), arr, {})}, chunks={"v": cs}, compress=level
    )
    assert (parse_hdf5(blob).read("v") == arr).all()


def test_gridstore_export_netcdf4_distributed(spark, tmp_path):
    """GridStore → sharded NetCDF4 export (one file per time bucket,
    executor-side writes) → files re-ingest through the distributed
    netcdf4 decoder path: the full migration loop."""
    import pandas as pd

    from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
    from zarr_climate_etl_ipfs_spark.sources.ingest import read_binary_gridded
    from zarr_climate_etl_ipfs_spark.sources.hdf5 import netcdf4_decoder
    from zarr_climate_etl_ipfs_spark.sources.store import GridStore, StoreError

    desc = DatasetDescriptor(dataset_name="t2m", data_var="t2m", time_bucket="month")
    pdf = pd.DataFrame({
        "time": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-02-01", "2024-02-02"] * 2
        ),
        "latitude": [10.0] * 4 + [20.0] * 4,
        "longitude": [100.0] * 8,
        "t2m": np.arange(8, dtype="float32"),
    })
    gs = GridStore(tmp_path / "gs", desc, spark)
    gs.write_initial(spark.createDataFrame(pdf))

    out = tmp_path / "nc"
    summary = gs.export_netcdf4(out)
    assert summary["files"] == 2 and summary["rows"] == 8
    assert sorted(p.name for p in out.iterdir()) == ["2024-01.nc", "2024-02.nc"]

    jan = parse_hdf5((out / "2024-01.nc").read_bytes())
    assert jan.variables["t2m"].attrs["DIMENSION_LIST"] == [
        ["time"], ["latitude"], ["longitude"]
    ]
    assert (jan.read("latitude") == [10.0, 20.0]).all()

    back = read_binary_gridded(
        spark, str(out / "*.nc"), desc, decoder=netcdf4_decoder(desc)
    )
    rows = {
        (str(r["time"])[:10], r["latitude"]): r["t2m"] for r in back.collect()
    }
    assert rows[("2024-02-02", 20.0)] == 7.0
    assert len(rows) == 8

    with pytest.raises(StoreError, match="overwrite"):
        gs.export_netcdf4(out)
    assert gs.export_netcdf4(out, overwrite=True)["files"] == 2
