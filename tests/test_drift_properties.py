"""Property-based invariants for the histogram drift statistics
(operators/ks): KS ∈ [0,1] and symmetric; PSI ≥ 0 and symmetric —
the algebraic facts the monitors rely on, checked over random
histograms instead of hand-picked ones."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_weather_spark.operators.ks import ks_from_histograms, psi_from_histograms

#: random (x, c) histogram with distinct x: up to 10 buckets, counts 1..40
hist_st = st.dictionaries(
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=1, max_value=40),
    min_size=1,
    max_size=10,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, h):
    return spark.createDataFrame(
        [(int(x), int(c)) for x, c in sorted(h.items())], "x long, c long"
    )


@given(a=hist_st, b=hist_st)
@_SETTINGS
def test_ks_bounded_and_symmetric(spark, a, b):
    ha, hb = _df(spark, a), _df(spark, b)
    r1 = ks_from_histograms(ha, hb).collect()[0]
    r2 = ks_from_histograms(hb, ha).collect()[0]
    assert 0.0 <= r1.ks_stat6 <= 1.0
    assert r1.ks_stat6 == r2.ks_stat6
    assert (r1.n_a, r1.n_b) == (r2.n_b, r2.n_a)


@given(a=hist_st, b=hist_st)
@_SETTINGS
def test_psi_nonnegative_and_symmetric(spark, a, b):
    """(p−q)·ln(p/q) has matching signs, so every term ≥ 0 (the 1e9
    ln-quantization can only zero a term, never flip it); the term is
    invariant under side swap."""
    ha, hb = _df(spark, a), _df(spark, b)
    r1 = psi_from_histograms(ha, hb).collect()[0]
    r2 = psi_from_histograms(hb, ha).collect()[0]
    assert r1.psi6 >= 0.0
    assert r1.psi6 == r2.psi6
    assert (r1.n_a, r1.n_b) == (r2.n_b, r2.n_a)


@given(a=hist_st)
@_SETTINGS
def test_identical_histograms_score_zero(spark, a):
    ha = _df(spark, a)
    assert ks_from_histograms(ha, ha).collect()[0].ks_stat6 == 0.0
    assert psi_from_histograms(ha, ha).collect()[0].psi6 == 0.0
