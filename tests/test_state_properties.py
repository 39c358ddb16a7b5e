"""Property tests (hypothesis): the compacted applied-id set must be
indistinguishable from a plain set, and the MG decrement-merge must
keep its error bound under arbitrary merge orders."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_weather_spark.streaming._state import AppliedIds
from etl_weather_spark.streaming.mg_maintain import mg_merge_counts


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=200), max_size=60))
def test_applied_ids_equals_plain_set(ids):
    a = AppliedIds()
    ref: set[int] = set()
    for b in ids:
        a = a | {b}
        ref.add(b)
    assert len(a) == len(ref)
    assert set(a) == ref
    for probe in range(-1, 202):
        assert (probe in a) == (probe in ref)
    # round-trip through the persisted representation
    floor, tail = a.arrays()
    b2 = AppliedIds(int(floor), (int(t) for t in tail))
    assert set(b2) == ref and len(b2) == len(ref)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_mg_merge_error_bound_any_order(batches, k):
    """After merging per-batch exact counts through mg_merge_counts in
    stream order: true − N/(k+1) ≤ stored ≤ true for every item, and
    any item with true count > N/(k+1) survives."""
    state: dict = {}
    truth: Counter = Counter()
    n = 0
    for batch in batches:
        c = Counter(batch)
        truth.update(c)
        n += len(batch)
        state = mg_merge_counts(state, dict(c), k)
    assert len(state) <= k
    bound = n / (k + 1)
    for item, stored in state.items():
        assert stored <= truth[item]
    for item, true in truth.items():
        if true > bound:
            assert item in state, (item, true, bound, state)
            assert state[item] >= true - bound - 1e-9
