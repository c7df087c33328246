"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5: the reference has no property-based testing).

Scalar/algorithmic properties run driver-side against the same Python math
the Catalyst expressions implement; one Spark-backed suite checks the
gaps-and-islands operator against a model implementation on arbitrary
day sets.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zarr_climate_etl_ipfs_spark.operators.qc import binom_test_pvalue


# -- longitude normalization (F1): pure formula ------------------------------


def _norm_lon(x: float) -> float:
    return ((x + 180.0) % 360.0 + 360.0) % 360.0 - 180.0


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_lon_normalize_range_and_idempotence(x):
    y = _norm_lon(x)
    assert -180.0 <= y < 180.0 or math.isclose(y, 180.0, abs_tol=1e-9)
    assert math.isclose(_norm_lon(y), y, abs_tol=1e-9)


@given(st.floats(min_value=-180.0, max_value=179.999, allow_nan=False))
def test_lon_normalize_fixed_point(x):
    assert math.isclose(_norm_lon(x), x, abs_tol=1e-6)


# -- CF time codec (F2): encode∘decode identity on whole-unit inputs ---------


@given(st.integers(min_value=0, max_value=100_000))
def test_cf_time_codec_roundtrip_days(days):
    epoch = dt.datetime(1980, 1, 1)
    ts = epoch + dt.timedelta(days=days)
    encoded = (ts - epoch).total_seconds() / 86400
    decoded = epoch + dt.timedelta(seconds=encoded * 86400)
    assert decoded == ts
    assert encoded == days


# -- binomial test (A5): statistical sanity ----------------------------------


@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=200),
    st.floats(min_value=0.01, max_value=0.99),
)
def test_binom_pvalue_is_probability(k, n, p):
    if k > n:
        k = n
    pv = binom_test_pvalue(k, n, p)
    assert 0.0 <= pv <= 1.0


@given(st.integers(min_value=20, max_value=200), st.floats(min_value=0.2, max_value=0.8))
def test_binom_pvalue_peak_at_expectation(n, p):
    """p-value at k=round(n·p) must be no smaller than at the extremes."""
    k_mid = round(n * p)
    assert binom_test_pvalue(k_mid, n, p) >= binom_test_pvalue(0, n, p)
    assert binom_test_pvalue(k_mid, n, p) >= binom_test_pvalue(n, n, p)


# -- minhash (dedup): affine family stays in range, signature is permutation-
#    invariant over the shingle set ------------------------------------------


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=12), min_size=1, max_size=30))
def test_minhash_python_model_set_semantics(shingle_list):
    """Model check of the hash family used by dedup.minhash_from_bases:
    set semantics (duplicates don't change the min), order-invariance."""
    import hashlib

    from zarr_climate_etl_ipfs_spark.operators.dedup import (
        MINHASH_BASE_MOD,
        MINHASH_PRIME,
        minhash_coeffs,
    )

    def md5int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

    def sig(shingles):
        bases = [md5int(s) % MINHASH_BASE_MOD for s in shingles]
        return [min((a * b + c) % MINHASH_PRIME for b in bases) for a, c in minhash_coeffs(4)]

    s1 = sig(shingle_list)
    s2 = sig(list(reversed(shingle_list)) + shingle_list)  # dup + reorder
    assert s1 == s2
    assert all(0 <= v < MINHASH_PRIME for v in s1)


# -- gaps-and-islands (W1): Spark vs model on arbitrary day sets -------------


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(min_value=0, max_value=120), min_size=1, max_size=60),
)
def test_contiguous_ranges_matches_model(spark, day_offsets):
    import pandas as pd

    from zarr_climate_etl_ipfs_spark.operators.updates import contiguous_ranges

    base = dt.datetime(2021, 1, 1)
    days = sorted(base + dt.timedelta(days=o) for o in day_offsets)

    # model: linear scan
    expected = []
    start = prev = days[0]
    for d in days[1:]:
        if (d - prev).days == 1:
            prev = d
        else:
            expected.append((start, prev, (prev - start).days + 1))
            start = prev = d
    expected.append((start, prev, (prev - start).days + 1))

    df = spark.createDataFrame(pd.DataFrame({"time": days}))
    got = [
        (r["range_start"], r["range_end"], r["n_steps"])
        for r in contiguous_ranges(df, dt.timedelta(days=1)).collect()
    ]
    assert got == expected
