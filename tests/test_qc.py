"""QC pack tests — scenarios 6-9 of FIXTURES.md §8
(reference tests/unit/utils/test_publish.py:1304-1399)."""

from __future__ import annotations

import math
from dataclasses import replace

import numpy as np
import pytest
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.operators.qc import (
    NanFrequencyMismatchError,
    QualityCheckError,
    binom_test_pvalue,
    check_dtype,
    compare_datasets,
    nan_binomial_check,
    sample_value_check,
)


def test_check_dtype_ok(initial_df, desc):
    check_dtype(initial_df, desc)


def test_check_dtype_double_rejected(initial_df, desc):
    """Scenario 6: dtype drift (float64) rejected (publish.py:526-532)."""
    bad = initial_df.withColumn("data", F.col("data").cast("double"))
    with pytest.raises(QualityCheckError, match="float"):
        check_dtype(bad, desc)


def test_binom_test_pvalue_basic():
    # k == n*p → p-value 1; extreme k → tiny p-value
    assert binom_test_pvalue(50, 100, 0.5) == pytest.approx(1.0, abs=0.1)
    assert binom_test_pvalue(0, 1000, 0.5) < 1e-200
    assert binom_test_pvalue(0, 100, 0.0) == 1.0
    assert binom_test_pvalue(1, 100, 0.0) == 0.0
    # symmetry-ish sanity vs a normal approximation
    k, n, p = 60, 100, 0.5
    z = (k - n * p) / math.sqrt(n * p * (1 - p))
    approx = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2))))
    assert binom_test_pvalue(k, n, p) == pytest.approx(approx, rel=0.5)


def test_nan_binomial_check_passes_at_expected_rate(spark, desc, initial_pdf):
    """Scenario 7 (pass side): ~20% NaN when 20% expected → no offenders."""
    pdf = initial_pdf.copy()
    rng = np.random.RandomState(7)
    mask = rng.rand(len(pdf)) < 0.2
    pdf.loc[mask, "data"] = np.nan
    d = replace(desc, has_nans=True, expected_nan_frequency=0.2)
    df = spark.createDataFrame(pdf, schema=d.schema())
    offenders = nan_binomial_check(df, d)
    assert offenders.count() == 0


def test_nan_binomial_check_drift_rejected(spark, desc, initial_pdf):
    """Scenario 7 (fail side): 80% NaN when 20% expected → raises."""
    pdf = initial_pdf.copy()
    rng = np.random.RandomState(8)
    mask = rng.rand(len(pdf)) < 0.8
    pdf.loc[mask, "data"] = np.nan
    d = replace(desc, has_nans=True, expected_nan_frequency=0.2)
    df = spark.createDataFrame(pdf, schema=d.schema())
    with pytest.raises(NanFrequencyMismatchError):
        nan_binomial_check(df, d)


def test_sample_value_check_extremes_rejected(spark, desc, initial_pdf):
    """Scenario 8: values outside deg_C bounds [-90, 60] rejected."""
    pdf = initial_pdf.copy()
    pdf.loc[pdf.index[:50], "data"] = 1000.0
    d = replace(desc, unit_of_measurement="deg_C")
    df = spark.createDataFrame(pdf, schema=d.schema())
    with pytest.raises(QualityCheckError):
        sample_value_check(df, d, n=1000)


def test_sample_value_check_clean_passes(initial_df, desc):
    sample_value_check(initial_df, replace(desc, unit_of_measurement="deg_C"), n=500)


def test_compare_datasets_roundtrip_ok(initial_df, desc):
    """Scenario 9: identical source/written → no mismatches."""
    assert compare_datasets(initial_df, initial_df, desc).count() == 0


def test_compare_datasets_detects_corruption(spark, desc, initial_pdf):
    corrupted = initial_pdf.copy()
    corrupted.loc[corrupted.index[:10], "data"] += 1.0  # > 1e-4 tolerance
    src = spark.createDataFrame(initial_pdf, schema=desc.schema())
    out = spark.createDataFrame(corrupted, schema=desc.schema())
    assert compare_datasets(src, out, desc).count() == 10


def test_compare_datasets_nan_matches_nan(spark, desc, initial_pdf):
    withnan = initial_pdf.copy()
    withnan.loc[withnan.index[:10], "data"] = np.nan
    a = spark.createDataFrame(withnan, schema=desc.schema())
    assert compare_datasets(a, a, desc).count() == 0


def test_compare_datasets_missing_key_keeps_var_dtype(spark, desc, initial_pdf):
    """The missing-key leg's NULL _out must carry the published var's OWN
    dtype — a hardcoded float cast relied on union type-widening (silent
    for double, analysis error for integer vars) — r15 advice fix."""
    pdf = initial_pdf.copy()
    pdf["data"] = pdf["data"].astype("float64")
    d = replace(desc)
    schema = "time timestamp_ntz, latitude float, longitude float, data double"
    src = spark.createDataFrame(pdf, schema=schema)
    out = spark.createDataFrame(pdf.iloc[100:], schema=schema)  # 100 keys missing
    result = compare_datasets(src, out, d)
    assert dict(result.dtypes)["_out"] == "double"  # not widened from float
    assert result.count() == 100
    # integer data var: would have been an analysis error under the old cast
    ipdf = pdf.copy()
    ipdf["data"] = (ipdf["data"] * 0).astype("int64")
    ischema = "time timestamp_ntz, latitude float, longitude float, data long"
    isrc = spark.createDataFrame(ipdf, schema=ischema)
    iout = spark.createDataFrame(ipdf.iloc[50:], schema=ischema)
    ires = compare_datasets(isrc, iout, d)
    assert dict(ires.dtypes)["_out"] == "bigint"
    assert ires.count() == 50


def test_compare_datasets_tolerance_boundary(spark, desc, initial_pdf):
    nudged = initial_pdf.copy()
    nudged["data"] = nudged["data"] + np.float32(5e-5)  # within 1e-4
    src = spark.createDataFrame(initial_pdf, schema=desc.schema())
    out = spark.createDataFrame(nudged, schema=desc.schema())
    assert compare_datasets(src, out, desc).count() == 0


def test_post_parse_quality_check_pass(initial_df, desc):
    from zarr_climate_etl_ipfs_spark.operators.qc import post_parse_quality_check

    post_parse_quality_check(initial_df, initial_df, desc)


def test_post_parse_quality_check_detects_bad_publish(spark, desc, initial_pdf):
    from zarr_climate_etl_ipfs_spark.operators.qc import post_parse_quality_check

    corrupted = initial_pdf.copy()
    corrupted["data"] = corrupted["data"] + np.float32(1.0)
    src = spark.createDataFrame(initial_pdf, schema=desc.schema())
    out = spark.createDataFrame(corrupted, schema=desc.schema())
    with pytest.raises(QualityCheckError, match="post-parse"):
        post_parse_quality_check(src, out, desc, n_samples=50)


def test_post_parse_quality_check_time_budget_short_circuits(spark, desc, initial_pdf):
    """Q6 budget parity (publish.py:24, 735-737): an expired wall-clock cap
    abandons further checking — even a would-fail publish does not raise
    when the budget is gone before the comparison starts."""
    from zarr_climate_etl_ipfs_spark.operators.qc import post_parse_quality_check

    corrupted = initial_pdf.copy()
    corrupted["data"] = corrupted["data"] + np.float32(1.0)
    src = spark.createDataFrame(initial_pdf, schema=desc.schema())
    out = spark.createDataFrame(corrupted, schema=desc.schema())
    # cap of 0 s is exhausted by the source count itself -> clean give-up
    post_parse_quality_check(src, out, desc, n_samples=50, time_cap_s=0.0)


def test_sample_value_check_allows_nan_when_declared(spark, desc, initial_pdf):
    """has_nans=True must actually permit NaN: Spark orders NaN above every
    numeric, so abs(NaN) > 1e100 and NaN > hi are both TRUE — permitted
    NaNs used to trip the infinity/extreme checks (round-14 review catch)."""
    import dataclasses

    d = dataclasses.replace(desc, has_nans=True, expected_nan_frequency=0.5)
    pdf = initial_pdf.copy()
    pdf.loc[pdf.index[: len(pdf) // 2], "data"] = float("nan")
    df = spark.createDataFrame(pdf)
    sample_value_check(df, d, n=1000)  # must NOT raise
    # while a genuine +inf still fails even with has_nans=True
    pdf2 = initial_pdf.copy()
    pdf2.loc[pdf2.index[0], "data"] = float("inf")
    with pytest.raises(QualityCheckError):
        sample_value_check(spark.createDataFrame(pdf2), d, n=1000)


def test_compare_datasets_sign_matters_for_inf(spark, desc, initial_pdf):
    """+inf vs -inf (or huge values of opposite sign) is a REAL mismatch:
    the magnitude-only both-infinityish rule passed a sign-corrupted
    publish (round-14 review catch); same-sign infinities still match."""
    src = initial_pdf.copy()
    out = initial_pdf.copy()
    src.loc[src.index[0], "data"] = float("inf")
    out.loc[out.index[0], "data"] = float("-inf")
    bad = compare_datasets(
        spark.createDataFrame(src), spark.createDataFrame(out), desc
    ).collect()
    assert len(bad) == 1
    # same-sign: matches
    out2 = initial_pdf.copy()
    out2.loc[out2.index[0], "data"] = float("inf")
    assert compare_datasets(
        spark.createDataFrame(src), spark.createDataFrame(out2), desc
    ).count() == 0


def test_compare_datasets_missing_keys_still_reported(spark, desc, initial_pdf):
    """The broadcast-correct restructure (inner + anti) must keep reporting
    sampled keys absent from the published table, with a NULL _out."""
    src = initial_pdf.copy()
    out = initial_pdf.iloc[5:].copy()  # first 5 keys missing from 'written'
    bad = compare_datasets(
        spark.createDataFrame(src), spark.createDataFrame(out), desc
    ).collect()
    assert len(bad) == 5 and all(r["_out"] is None for r in bad)
