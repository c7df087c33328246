"""Tests for the xarray-workload climate operators."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.operators import climate


@pytest.fixture(scope="module")
def grid_df(spark):
    """2 years daily × 2×2 grid with a known seasonal signal + cell offset."""
    rows = []
    d0 = dt.datetime(2020, 1, 1)
    for d in range(731):
        t = d0 + dt.timedelta(days=d)
        doy = t.timetuple().tm_yday
        for i, lat in enumerate((10.0, 20.0)):
            for j, lon in enumerate((100.0, 110.0)):
                v = 10.0 * i + j + float(doy % 10)  # deterministic, period-10
                rows.append((t, np.float32(lat), np.float32(lon), np.float32(v)))
    pdf = pd.DataFrame(rows, columns=["time", "latitude", "longitude", "v"])
    return spark.createDataFrame(pdf)


def test_climatology_reproduces_signal(grid_df):
    clim = climate.climatology(grid_df, "v", freq="dayofyear")
    # cell (10,100): value = doy%10 exactly → climatological std 0, mean = doy%10
    row = clim.filter(
        (F.col("latitude") == 10.0) & (F.col("longitude") == 100.0) & (F.col("period") == 5)
    ).first()
    assert row["clim_mean"] == pytest.approx(5 % 10, abs=1e-6)
    assert row["clim_std"] == pytest.approx(0.0, abs=1e-6)
    assert row["n"] == 2  # two years contribute doy=5


def test_anomaly_zero_for_pure_signal(grid_df):
    an = climate.anomaly(grid_df, "v", freq="dayofyear")
    stats = an.agg(F.max(F.abs("anomaly")).alias("m")).first()
    assert stats["m"] == pytest.approx(0.0, abs=1e-5)  # signal is purely periodic


def test_anomaly_detects_perturbation(spark, grid_df):
    pdf = grid_df.toPandas()
    # spike one day at one cell
    mask = (
        (pdf.time == dt.datetime(2021, 6, 1))
        & (pdf.latitude == 10.0)
        & (pdf.longitude == 100.0)
    )
    pdf.loc[mask, "v"] = 100.0
    df = spark.createDataFrame(pdf)
    an = climate.anomaly(df, "v", freq="dayofyear")
    top = an.orderBy(F.col("anomaly").desc()).first()
    assert top["time"] == dt.datetime(2021, 6, 1)
    assert top["latitude"] == 10.0 and top["longitude"] == 100.0
    assert top["anomaly"] > 40


def test_rolling_time_agg(spark):
    rows = [
        (dt.datetime(2020, 1, 1) + dt.timedelta(days=d), np.float32(1.0), np.float32(1.0), np.float32(d))
        for d in range(10)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["time", "latitude", "longitude", "v"])
    )
    out = climate.rolling_time_agg(df, "v", days=3).orderBy("time").collect()
    # day 0: mean(0)=0; day 2: mean(0,1,2)=1; day 9: mean(7,8,9)=8
    assert out[0]["rolling_mean_3d"] == 0.0
    assert out[2]["rolling_mean_3d"] == 1.0
    assert out[9]["rolling_mean_3d"] == 8.0
    assert out[9]["rolling_sum_3d"] == 24.0


def test_rolling_skips_gap_days(spark):
    """Range frame is on event time: a data gap shrinks the window."""
    days = [0, 1, 5]
    rows = [
        (dt.datetime(2020, 1, 1) + dt.timedelta(days=d), np.float32(1.0), np.float32(1.0), np.float32(10.0))
        for d in days
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["time", "latitude", "longitude", "v"])
    )
    out = climate.rolling_time_agg(df, "v", days=3).orderBy("time").collect()
    assert out[1]["rolling_sum_3d"] == 20.0  # days 0+1
    assert out[2]["rolling_sum_3d"] == 10.0  # day 5 alone (gap > 3d)


def test_coarsen(grid_df):
    out = climate.coarsen(grid_df, "v", lat_step=30.0, lon_step=30.0)
    # lats {10,20}→block 0, lons {100,110}→block 90: one 30° block
    assert out.select("latitude", "longitude").distinct().count() == 1
    row = out.filter(F.col("time") == dt.datetime(2020, 1, 6)).first()
    assert row["n_cells"] == 4
    doy = 6 % 10
    assert row["v"] == pytest.approx((0 + 1 + 10 + 11) / 4 + doy, abs=1e-5)


def test_resample_time(grid_df):
    out = climate.resample_time(grid_df, "v", grain="month")
    assert out.filter(F.col("period") == "2020-01").count() == 4  # one row per cell
    row = out.filter(
        (F.col("period") == "2020-02") & (F.col("latitude") == 10.0) & (F.col("longitude") == 100.0)
    ).first()
    assert row["n"] == 29  # leap February
    assert row["v_min"] >= 0.0 and row["v_max"] <= 9.0


def test_fill_time_gaps_linear(spark):
    rows = [
        (dt.datetime(2020, 1, 1), np.float32(1.0), np.float32(1.0), np.float32(10.0)),
        (dt.datetime(2020, 1, 4), np.float32(1.0), np.float32(1.0), np.float32(40.0)),
        (dt.datetime(2020, 1, 5), np.float32(1.0), np.float32(1.0), np.float32(50.0)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["time", "latitude", "longitude", "v"])
    )
    out = climate.fill_time_gaps(df, "v").orderBy("time").collect()
    assert [r["time"].day for r in out] == [1, 2, 3, 4, 5]
    assert [r["was_gap"] for r in out] == [False, True, True, False, False]
    # linear between 10 (day1) and 40 (day4): day2=20, day3=30
    assert [r["v"] for r in out] == [10.0, 20.0, 30.0, 40.0, 50.0]


def test_fill_time_gaps_ffill(spark):
    rows = [
        (dt.datetime(2020, 1, 1), np.float32(1.0), np.float32(1.0), np.float32(7.0)),
        (dt.datetime(2020, 1, 3), np.float32(1.0), np.float32(1.0), np.float32(9.0)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["time", "latitude", "longitude", "v"])
    )
    out = climate.fill_time_gaps(df, "v", method="ffill").orderBy("time").collect()
    assert [r["v"] for r in out] == [7.0, 7.0, 9.0]


def test_fill_time_gaps_per_cell_independent(spark):
    rows = [
        (dt.datetime(2020, 1, 1), np.float32(1.0), np.float32(1.0), np.float32(1.0)),
        (dt.datetime(2020, 1, 3), np.float32(1.0), np.float32(1.0), np.float32(3.0)),
        (dt.datetime(2020, 1, 1), np.float32(2.0), np.float32(1.0), np.float32(5.0)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["time", "latitude", "longitude", "v"])
    )
    out = climate.fill_time_gaps(df, "v")
    # cell (1,1): 3 rows (1 gap filled); cell (2,1): single point, no gaps
    assert out.filter(F.col("latitude") == 1.0).count() == 3
    assert out.filter(F.col("latitude") == 2.0).count() == 1


def test_bilinear_regrid_custom_target_columns(spark):
    """target_lat_col/target_lon_col parameterize the target frame's
    coordinate names symmetrically with the grid side's lat_col/lon_col,
    and the output mirrors the caller's names (regression: lat_t/lon_t
    were hardcoded, failing opaquely for any other target schema)."""
    import pandas as pd

    grid = spark.createDataFrame(
        pd.DataFrame(
            [(la, lo, 2.0 * la + lo) for la in (0.0, 0.5, 1.0) for lo in (0.0, 0.5, 1.0)],
            columns=["latitude", "longitude", "v"],
        )
    )
    targets = spark.createDataFrame(
        pd.DataFrame([(0.25, 0.25), (0.5, 0.75)], columns=["plat", "plon"])
    )
    out = climate.bilinear_regrid(
        grid, "v", targets, lat_step=0.5, lon_step=0.5,
        target_lat_col="plat", target_lon_col="plon",
    )
    got = {(r.plat, r.plon): r.v_interp for r in out.collect()}
    # v is linear in (lat, lon) so bilinear interpolation is exact
    assert got[(0.25, 0.25)] == pytest.approx(2.0 * 0.25 + 0.25)
    assert got[(0.5, 0.75)] == pytest.approx(2.0 * 0.5 + 0.75)
    assert sorted(out.columns) == ["plat", "plon", "v_interp"]


def _write_events(td, rows):
    import os

    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(os.path.join(td, "events.parquet"))


def test_ols_trend_detrend_exact_line(spark):
    """A series that IS a line fits exactly: slope/intercept recover the
    generating coefficients and the residuals vanish — the external anchor
    engine-vs-engine agreement can't provide. A one-day series must be
    excluded (no slope from a single x)."""
    import tempfile

    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    rows = []
    for day in range(5):
        ts = dt.datetime(2024, 1, 1 + day, 12, 0, 0)
        rows.append((day, ts, 1, "a", 10.0 + 3.0 * day, "{}"))
    rows.append((99, dt.datetime(2024, 1, 1), 1, "b", 42.0, "{}"))  # 1 day only
    with tempfile.TemporaryDirectory() as td:
        _write_events(td, rows)
        out = {r["event_type"]: r for r in REGISTRY["ols_trend_detrend"].fn(spark, td).collect()}
    assert list(out) == ["a"]
    a = out["a"]
    assert a["n_days"] == 5
    assert a["slope_per_day"] == 3.0
    assert a["intercept"] == 10.0
    assert a["rss"] == 0.0
    assert a["max_abs_resid"] == 0.0


def test_idw_regrid_two_point_weights(spark):
    """Hand-checked Shepard weights: two points one cell apart. The shared
    node mixes them 1 : 1/2; each point's own node mixes 1 : 1/2 the other
    way; nodes two cells out see only one contributor."""
    import tempfile

    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (5, t0, 3, "a", 0.0, "{}"),   # px=5, py=3, value 0
        (6, t0, 3, "a", 12.0, "{}"),  # px=6, py=3, value 12
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(td, rows)
        out = {(r["gx"], r["gy"]): r for r in REGISTRY["idw_regrid"].fn(spark, td).collect()}
    # node under point A: A at d²=0 (w=1), B at d²=1 (w=1/2) → 12·0.5/1.5
    assert out[(5, 3)]["n_contrib"] == 2
    assert out[(5, 3)]["idw_value"] == 4.0
    # node under point B: the mirror mix → 12·1/1.5
    assert out[(6, 3)]["idw_value"] == 8.0
    # diagonal node sees both: A at d²=1 (w=.5), B at d²=2 (w=1/3)
    assert out[(5, 4)]["n_contrib"] == 2
    assert out[(5, 4)]["idw_value"] == round(12.0 * (1 / 3) / (0.5 + 1 / 3), 4)
    # two cells from B, one from A: only A contributes
    assert out[(4, 3)]["n_contrib"] == 1
    assert out[(4, 3)]["idw_value"] == 0.0
    # kernel support is the 3×3 neighbourhood: nothing lands 2 cells out
    assert (3, 3) not in out and (8, 3) not in out


def test_tx90p_exceedance_hand_case(spark):
    """21 days of tmax = 1..21: the rank-picked p90 is ceil(0.9·21) = the
    19th order statistic, so exactly days 20 and 21 exceed and the warm
    amplitude is (20−19) + (21−19) = 3."""
    import tempfile

    from zarr_climate_etl_ipfs_spark.plans.queries import REGISTRY

    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12), 1, "a", float(i + 1), "{}")
        for i in range(21)
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(td, rows)
        out = {r["event_type"]: r for r in REGISTRY["tx90p_exceedance"].fn(spark, td).collect()}
    a = out["a"]
    assert a["n_days"] == 21
    assert a["p90_threshold"] == 19.0
    assert a["n_tx90p_days"] == 2
    assert a["warm_amplitude"] == 3.0
