"""Listing helpers (S21/P8/O2; reference utils/convenience.py:105-118,
utils/transform.py:74-86)."""

from __future__ import annotations

from pathlib import Path

from zarr_climate_etl_ipfs_spark.sources.listing import (
    filter_by_substrings,
    filter_gridded,
    input_files,
    natsorted,
)


def test_natural_sort_orders_numerically():
    names = ["f10.nc", "f2.nc", "f1.nc", "F3.nc"]
    assert [str(p) for p in natsorted(names)] == ["f1.nc", "f2.nc", "F3.nc", "f10.nc"]


def test_input_files_skips_hidden_and_idx(tmp_path):
    for name in ("b2.nc", "b10.nc", "b1.nc", ".hidden.nc", "b1.grib.idx"):
        (tmp_path / name).write_bytes(b"x")
    (tmp_path / "subdir").mkdir()
    got = [p.name for p in input_files(tmp_path)]
    assert got == ["b1.nc", "b2.nc", "b10.nc"]


def test_filter_gridded_extensions():
    paths = [Path(p) for p in ("a.nc", "b.nc4", "c.grb2", "d.txt", "e.json")]
    assert [p.name for p in filter_gridded(paths)] == ["a.nc", "b.nc4", "c.grb2"]


def test_filter_by_substrings_any_match():
    paths = [Path(p) for p in ("x_2003.nc", "x_2004.nc", "y_2003.nc")]
    assert [p.name for p in filter_by_substrings(paths, ["2003"])] == [
        "x_2003.nc",
        "y_2003.nc",
    ]
    assert [p.name for p in filter_by_substrings(paths, ["2004", "y_"])] == [
        "x_2004.nc",
        "y_2003.nc",
    ]
    assert len(filter_by_substrings(paths, None)) == 3
