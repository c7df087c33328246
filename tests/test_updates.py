"""Update-semantics tests — ports of the reference's publish behavioral
contract (tests/unit/utils/test_publish.py:576-620, 898, 1110-1204)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import COMPLEX_UPDATE_TIMES, daily
from zarr_climate_etl_ipfs_spark.operators.updates import (
    check_cadence,
    contiguous_ranges,
    split_update_times,
    validate_update,
)

DAY = dt.timedelta(days=1)


def _times_df(spark, times):
    return spark.createDataFrame([(t,) for t in times], "time timestamp")


def test_split_update_times(spark, initial_df, complex_update_df):
    inserts, appends = split_update_times(
        initial_df.select("time"), complex_update_df.select("time")
    )
    ins = [r["time"] for r in inserts.collect()]
    app = [r["time"] for r in appends.collect()]
    # initial covers 2021-09-16..2022-01-31; complex update has 24 days inside
    # that range and 36 days after it (2022-02-01..03-08).
    boundary = dt.datetime(2022, 1, 31, 23, 59)
    assert len(ins) == 24 and len(app) == 36
    assert all(t <= boundary for t in ins)
    assert all(t > boundary for t in app)
    assert ins == sorted(ins) and app == sorted(app)
    assert set(ins) | set(app) == set(COMPLEX_UPDATE_TIMES)


def test_contiguous_ranges_complex(spark):
    df = _times_df(spark, COMPLEX_UPDATE_TIMES)
    ranges = contiguous_ranges(df, DAY).collect()
    got = [(r["range_start"], r["range_end"], r["n_steps"]) for r in ranges]
    expect = [
        (dt.datetime(2021, 10, 10), dt.datetime(2021, 10, 10), 1),
        (dt.datetime(2021, 10, 16), dt.datetime(2021, 10, 23), 8),
        (dt.datetime(2021, 11, 11), dt.datetime(2021, 11, 11), 1),
        (dt.datetime(2021, 12, 11), dt.datetime(2021, 12, 11), 1),
        (dt.datetime(2021, 12, 25), dt.datetime(2022, 1, 5), 12),
        (dt.datetime(2022, 1, 14), dt.datetime(2022, 1, 14), 1),
        (dt.datetime(2022, 2, 1), dt.datetime(2022, 3, 8), 36),
    ]
    assert got == expect


def test_check_cadence_contiguous_ok(spark):
    df = _times_df(spark, daily("2021-09-16", 10))
    assert check_cadence(df, DAY).count() == 0


def test_check_cadence_gap_detected(spark):
    times = daily("2021-09-16", 5) + daily("2021-09-23", 3)  # hole 09-21/22
    df = _times_df(spark, times)
    bad = check_cadence(df, DAY).collect()
    assert len(bad) == 1
    assert bad[0]["time"] == dt.datetime(2021, 9, 23)


def test_check_cadence_bounds_irregular_ok(spark):
    times = [
        dt.datetime(2021, 9, 16),
        dt.datetime(2021, 9, 18),
        dt.datetime(2021, 9, 21),
    ]
    df = _times_df(spark, times)
    bounds = (dt.timedelta(days=1), dt.timedelta(days=3))
    assert check_cadence(df, DAY, cadence_bounds=bounds).count() == 0
    assert check_cadence(df, DAY).count() == 2


def test_validate_update_append_bridge_ok(spark, initial_df):
    update = _times_df(spark, daily("2022-02-01", 5))
    v = validate_update(initial_df.select("time"), update, DAY)
    assert v.ok, v.errors


def test_validate_update_append_hole_rejected(spark, initial_df):
    # first append 2022-02-03 but existing ends 2022-01-31 → bridge broken
    update = _times_df(spark, daily("2022-02-03", 5))
    v = validate_update(initial_df.select("time"), update, DAY)
    assert not v.ok
    assert "append bridge broken" in v.errors[0]


def test_validate_update_before_start_rejected(spark, initial_df):
    update = _times_df(spark, daily("2021-01-01", 3) + daily("2022-02-01", 1))
    v = validate_update(
        initial_df.select("time"),
        update,
        DAY,
        dataset_start=dt.datetime(2021, 9, 16),
    )
    assert not v.ok
    assert "before dataset start" in v.errors[0]


def test_validate_update_empty_rejected(spark, initial_df):
    update = _times_df(spark, [])
    v = validate_update(initial_df.select("time"), update, DAY)
    assert not v.ok and v.errors == ["empty update"]


def _ntz_times_df(spark, times):
    return spark.createDataFrame([(t,) for t in times], "time timestamp_ntz")


def test_validate_update_offgrid_append_rejected(spark, initial_df):
    """Count identity alone can be fooled: delta=1d with appends at
    {d+0, d+0.5, d+2} has n=3 == span_steps=3 but hides a hole behind an
    off-grid step — the grid check must reject it."""
    base = dt.datetime(2022, 2, 1)
    update = _times_df(
        spark, [base, base + dt.timedelta(hours=12), base + dt.timedelta(days=2)]
    )
    v = validate_update(initial_df.select("time"), update, DAY)
    assert not v.ok
    assert "off the expected cadence grid" in v.errors[0]


def test_validate_update_collapsed_grid_positions_rejected(spark, initial_df):
    """Sub-second jitter rounding two appends onto one grid slot must not
    mask the missing slot elsewhere."""
    base = dt.datetime(2022, 2, 1)
    update = _times_df(
        spark,
        [base, base + dt.timedelta(microseconds=1), base + dt.timedelta(days=2)],
    )
    v = validate_update(initial_df.select("time"), update, DAY)
    assert not v.ok


def test_update_ops_accept_timestamp_ntz(spark):
    """Spark 4 reads tz-less parquet as TIMESTAMP_NTZ; the whole update
    library must work on NTZ-typed time columns (no raw numeric casts)."""
    times = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=h) for h in range(24) if h != 7]
    df = _ntz_times_df(spark, times)
    assert dict(df.dtypes)["time"] == "timestamp_ntz"
    viol = check_cadence(df, dt.timedelta(hours=1)).collect()
    assert len(viol) == 1 and viol[0]["_delta_s"] == 7200.0
    islands = contiguous_ranges(df, dt.timedelta(hours=1)).collect()
    assert [r["n_steps"] for r in islands] == [7, 16]
    existing = _ntz_times_df(spark, times[:7])
    good = _ntz_times_df(spark, [dt.datetime(2024, 1, 1, 7)])
    assert validate_update(existing, good, dt.timedelta(hours=1)).ok
    holey = _ntz_times_df(
        spark, [dt.datetime(2024, 1, 1, 7), dt.datetime(2024, 1, 1, 9)]
    )
    assert not validate_update(existing, holey, dt.timedelta(hours=1)).ok
