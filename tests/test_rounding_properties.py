"""Property tests for the cross-engine determinism layer.

The whole oracle gate rests on two invariants of functions/rounding.py;
hypothesis hammers them directly (pure Python — the same IEEE-754 ops
Spark and DuckDB execute):

1. item rounding: for a double that is the nearest representation of a
   k/10^s fixed-point value, floor(x*10^s + 0.5) recovers k exactly —
   so dsum's scaled-long accumulation and a DECIMAL(,s) cast agree.
2. sum exactness: the scaled-long sum over any ordering equals the
   Decimal ground truth — accumulation order can never flip a hash.
"""

from __future__ import annotations

import math
import random
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    k=st.integers(min_value=-(10**13), max_value=10**13),
    scale_pow=st.sampled_from([2, 4, 6]),
)
@settings(max_examples=500)
def test_scaled_floor_recovers_fixed_point(k: int, scale_pow: int):
    s = 10**scale_pow
    x = k / s  # the double nearest to the fixed-point rational
    assert math.floor(x * s + 0.5) == k


@given(
    ks=st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=200),
    scale_pow=st.sampled_from([2, 6]),
)
@settings(max_examples=200)
def test_scaled_long_sum_is_order_independent_and_exact(ks: list[int], scale_pow: int):
    s = 10**scale_pow
    xs = [k / s for k in ks]
    ground_truth = sum(Decimal(k) for k in ks)  # exact integer arithmetic

    def scaled_sum(vals):
        return sum(math.floor(v * s + 0.5) for v in vals)

    assert scaled_sum(xs) == ground_truth
    shuffled = xs[:]
    random.Random(0).shuffle(shuffled)
    assert scaled_sum(shuffled) == ground_truth


@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
@settings(max_examples=500)
def test_rnd_form_is_pure_ieee(x: float):
    # floor(x*100+0.5)/100 must be reproducible from the double alone —
    # re-evaluating is bit-identical (no hidden state, unlike banker's
    # rounding on shortest-repr which depends on the decimal formatter)
    a = math.floor(x * 100 + 0.5) / 100
    b = math.floor(x * 100 + 0.5) / 100
    assert a == b and not math.isnan(a)
