"""Synthetic fixtures replicating the reference's unit-test datasets
(FIXTURES.md; reference tests/unit/conftest.py:22-134)."""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import SparkSession

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor

LATS = [10.0, 20.0, 30.0, 40.0]
LONS = [100.0, 110.0, 120.0, 130.0]


def _shim_protobuf() -> None:
    """Make `google.protobuf` importable in environments without a pip
    install by borrowing the pure-Python runtime that ships inside the
    Google Cloud SDK, when one is present (this container: protobuf 6.32
    under the appengine platform dir). transformWithStateInPandas is the
    only consumer — its pb2 gencode (6.33) is one minor ahead of that
    runtime, so the upstream escape hatch
    TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK is set; the message set is
    plain scalar fields, unaffected by the 6.32→6.33 delta. PYTHONPATH is
    extended too so Spark's forked Python workers (which run the stateful
    processor) resolve the same module. No-op when protobuf is already
    installed or the SDK copy is absent — the importorskip in the v2 test
    then skips as before."""
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    sdk = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(sdk, "google", "protobuf")):
        return
    prev_check = os.environ.get("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK")
    prev_pp = os.environ.get("PYTHONPATH")
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    sys.path.append(sdk)  # append: never shadow a real site-packages install
    pp = prev_pp or ""
    if sdk not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pp + os.pathsep + sdk) if pp else sdk
    try:
        import google.protobuf  # noqa: F401
    except Exception:  # noqa: BLE001 — SDK copy unusable; revert FULLY so
        # Spark workers don't inherit a known-broken module (clean skip
        # beats confusing worker-side ImportErrors — round-8 review catch)
        sys.path.remove(sdk)
        if prev_pp is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prev_pp
        if prev_check is None:
            os.environ.pop("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None)


_shim_protobuf()


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("zarr-climate-etl-ipfs-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def desc():
    return DatasetDescriptor(
        dataset_name="fake_obs",
        data_var="data",
        time_resolution="daily",
        dataset_category="observation",
        dataset_start_date=dt.datetime(2021, 9, 16),
        allow_overwrite=True,
        time_bucket="month",
    )


def _tall(times: list[dt.datetime], seed: int = 0) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    for t in times:
        for lat in LATS:
            for lon in LONS:
                rows.append((t, lat, lon))
    df = pd.DataFrame(rows, columns=["time", "latitude", "longitude"])
    df["latitude"] = df["latitude"].astype("float32")
    df["longitude"] = df["longitude"].astype("float32")
    df["data"] = rng.standard_normal(len(df)).astype("float32")
    return df


def daily(start: str, days: int) -> list[dt.datetime]:
    d0 = dt.datetime.fromisoformat(start)
    return [d0 + dt.timedelta(days=i) for i in range(days)]


#: fixture 2's deliberately gappy 60 days (FIXTURES.md §2 / conftest.py:370-434)
COMPLEX_UPDATE_TIMES: list[dt.datetime] = (
    daily("2021-10-10", 1)
    + daily("2021-10-16", 8)
    + daily("2021-11-11", 1)
    + daily("2021-12-11", 1)
    + daily("2021-12-25", 12)
    + daily("2022-01-14", 1)
    + daily("2022-02-01", 36)
)


@pytest.fixture(scope="session")
def initial_pdf() -> pd.DataFrame:
    """fixture_initial: 138 daily steps 2021-09-16..2022-01-31, 4×4 grid."""
    return _tall(daily("2021-09-16", 138), seed=1)


@pytest.fixture(scope="session")
def complex_update_pdf() -> pd.DataFrame:
    assert len(COMPLEX_UPDATE_TIMES) == 60
    return _tall(COMPLEX_UPDATE_TIMES, seed=2)


@pytest.fixture(scope="session")
def initial_df(spark, initial_pdf, desc):
    return spark.createDataFrame(initial_pdf, schema=desc.schema())


@pytest.fixture(scope="session")
def complex_update_df(spark, complex_update_pdf, desc):
    return spark.createDataFrame(complex_update_pdf, schema=desc.schema())
