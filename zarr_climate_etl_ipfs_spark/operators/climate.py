"""Climate-analysis operators — the xarray workloads a reference user runs
on published datasets.

The reference library publishes Zarr stores; its users then analyze them
with xarray built-ins. "A user could switch" therefore needs the standard
reductions re-expressed on the tall table:

  xr.Dataset.groupby('time.dayofyear').mean()  → :func:`climatology`
  ds - climatology (anomalies)                 → :func:`anomaly`
  ds.rolling(time=7).mean()                    → :func:`rolling_time_agg`
  ds.coarsen(latitude=2, longitude=2).mean()   → :func:`coarsen`
  ds.resample(time='1M').mean()                → :func:`resample_time`

All are single-shuffle window/groupBy plans: the partition keys are the
spatial cell (and period), so at 100 TB each executor owns whole cell
histories and nothing quadratic ever forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PERIODS = {
    "dayofyear": lambda c: F.dayofyear(c),
    "month": lambda c: F.month(c),
    "hour": lambda c: F.hour(c),
}


def _period(time_col: str, freq: str) -> Column:
    try:
        return _PERIODS[freq](F.col(time_col))
    except KeyError:
        raise ValueError(f"freq must be one of {sorted(_PERIODS)}") from None


def climatology(
    df: DataFrame,
    value_col: str,
    time_col: str = "time",
    freq: str = "dayofyear",
    space_cols: tuple[str, ...] = ("latitude", "longitude"),
) -> DataFrame:
    """Per-cell, per-period long-term statistics
    (``groupby('time.dayofyear').mean()``)."""
    return (
        df.withColumn("period", _period(time_col, freq))
        .groupBy(*space_cols, "period")
        .agg(
            F.count(value_col).alias("n"),
            F.avg(value_col).alias("clim_mean"),
            F.stddev_pop(value_col).alias("clim_std"),
            F.min(value_col).alias("clim_min"),
            F.max(value_col).alias("clim_max"),
        )
    )


def anomaly(
    df: DataFrame,
    value_col: str,
    time_col: str = "time",
    freq: str = "dayofyear",
    space_cols: tuple[str, ...] = ("latitude", "longitude"),
) -> DataFrame:
    """value − per-(cell, period) climatological mean, as one window pass
    (no join back): partition by (cell, period), subtract the partition
    mean. Adds ``anomaly`` and ``standardized_anomaly`` columns."""
    w = Window.partitionBy(*space_cols, _period(time_col, freq))
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    return df.withColumn("anomaly", F.col(value_col) - mean).withColumn(
        "standardized_anomaly",
        F.when(std > 0, (F.col(value_col) - mean) / std),
    )


def rolling_time_agg(
    df: DataFrame,
    value_col: str,
    days: int = 7,
    time_col: str = "time",
    space_cols: tuple[str, ...] = ("latitude", "longitude"),
) -> DataFrame:
    """Trailing ``days``-day rolling mean/sum per cell
    (``ds.rolling(time=7).mean()``): a rangeBetween window on epoch seconds,
    partitioned by cell — each cell's history sorts once."""
    w = (
        Window.partitionBy(*space_cols)
        .orderBy(F.col(time_col).cast("long"))
        .rangeBetween(-(days - 1) * 86400, 0)
    )
    return df.withColumn(f"rolling_mean_{days}d", F.avg(value_col).over(w)).withColumn(
        f"rolling_sum_{days}d", F.sum(value_col).over(w)
    )


def coarsen(
    df: DataFrame,
    value_col: str,
    lat_step: float,
    lon_step: float,
    time_col: str = "time",
) -> DataFrame:
    """Spatial downsampling (``ds.coarsen(lat=k, lon=k).mean()``): snap each
    coordinate to its block origin, aggregate per (time, block). A pure
    groupBy — map-side combinable, shuffle ∝ output grid size."""
    lat_b = (F.floor(F.col("latitude") / lat_step) * lat_step).cast("float").alias("latitude")
    lon_b = (F.floor(F.col("longitude") / lon_step) * lon_step).cast("float").alias("longitude")
    return df.groupBy(F.col(time_col), lat_b, lon_b).agg(
        F.avg(value_col).alias(value_col),
        F.count("*").alias("n_cells"),
    )


def resample_time(
    df: DataFrame,
    value_col: str,
    grain: str = "month",  # day|month|year
    time_col: str = "time",
    space_cols: tuple[str, ...] = ("latitude", "longitude"),
) -> DataFrame:
    """Temporal downsampling (``ds.resample(time='1M').mean()``)."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}[grain]
    return df.groupBy(
        F.date_format(F.col(time_col), fmt).alias("period"), *space_cols
    ).agg(
        F.avg(value_col).alias(f"{value_col}_mean"),
        F.min(value_col).alias(f"{value_col}_min"),
        F.max(value_col).alias(f"{value_col}_max"),
        F.count(value_col).alias("n"),
    )
