"""SCD Type-2 collapse + as-of lookup semantics (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_weather_spark.operators.scd import scd2_collapse, scd2_lookup_asof


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, sec)


def _collapse(spark, rows):
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, a string")
    return scd2_collapse(
        df, key_col="k", ts_col="ts", attr_cols=["a"], tiebreak_cols=["eid"]
    )


def test_islands_collapse_and_intervals(spark):
    rows = [
        (1, _ts(1), 1, "x"), (1, _ts(2), 2, "x"), (1, _ts(3), 3, "y"),
        (1, _ts(4), 4, "x"),
        (2, _ts(1), 5, "z"),
    ]
    out = {(r.k, r.version): r for r in _collapse(spark, rows).collect()}
    assert len(out) == 4  # x-run, y, x-again (a new version!), and key 2
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1.a, v1.n_rows, v1.valid_from, v1.valid_to) == ("x", 2, _ts(1), _ts(3))
    assert (v2.a, v2.valid_from, v2.valid_to) == ("y", _ts(3), _ts(4))
    assert v3.a == "x" and v3.valid_to is None and v3.is_current
    assert not v1.is_current and not v2.is_current
    assert out[(2, 1)].is_current


def test_null_attrs_are_null_safe(spark):
    rows = [
        (1, _ts(1), 1, None), (1, _ts(2), 2, None),  # two nulls: one island
        (1, _ts(3), 3, "x"),                          # null -> x: change
        (1, _ts(4), 4, None),                         # x -> null: change
    ]
    out = sorted(_collapse(spark, rows).collect(), key=lambda r: r.version)
    assert [r.a for r in out] == [None, "x", None]
    assert [r.n_rows for r in out] == [2, 1, 1]


def test_timestamp_ties_break_deterministically(spark):
    # same ts, attr differs: eid orders the islands
    rows = [(1, _ts(1), 2, "b"), (1, _ts(1), 1, "a")]
    out = sorted(_collapse(spark, rows).collect(), key=lambda r: r.version)
    assert [r.a for r in out] == ["a", "b"]


def test_asof_lookup_resolves_interval_and_missing_keys(spark):
    rows = [
        (1, _ts(1), 1, "x"), (1, _ts(3), 2, "y"),
        (2, _ts(5), 3, "z"),  # first version after the probe time
    ]
    hist = _collapse(spark, rows)
    probes = spark.createDataFrame(
        [(1, _ts(2)), (1, _ts(4)), (2, _ts(2)), (3, _ts(2))],
        "k int, at timestamp",
    )
    got = {
        (r.k, r.at): r.a
        for r in scd2_lookup_asof(hist, probes, key_col="k", at_col="at").collect()
    }
    assert got[(1, _ts(2))] == "x"     # inside [d1, d3)
    assert got[(1, _ts(4))] == "y"     # open-ended current version
    assert got[(2, _ts(2))] is None    # key exists, not yet effective
    assert got[(3, _ts(2))] is None    # key never seen
