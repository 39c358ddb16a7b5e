"""Profiling and data-quality operator tests (operators/profiling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark.operators.profiling import (
    in_range,
    in_set,
    not_null,
    profile_table,
    referential_integrity,
    run_checks,
    unique_key,
)


def _sample(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (2, "b", 99.0),   # duplicate key (1,2 share id=2)
            (4, None, -5.0),
        ],
        "id long, k string, v double",
    )


def test_profile_table_one_row_per_column(spark):
    prof = {r.column: r for r in profile_table(_sample(spark)).collect()}
    assert set(prof) == {"id", "k", "v"}
    assert prof["id"].n_rows == 4 and prof["id"].n_null == 0
    assert prof["k"].n_null == 1 and prof["k"].null_frac == 0.25
    assert prof["v"].n_null == 1 and prof["v"].n_distinct == 3
    assert prof["id"].min_str == "1" and prof["id"].max_str == "4"
    # single scan: the profile is one aggregate, not one job per column
    assert profile_table(_sample(spark)).count() == 3


def test_checks_pass_and_fail(spark):
    df = _sample(spark)
    got = {
        r.check: (r.violations, r.passed)
        for r in run_checks(
            df,
            [
                not_null("id"),
                not_null("k"),
                unique_key("id"),
                in_range("v", 0.0, 100.0),
                in_set("k", ["a", "b"]),
            ],
        ).collect()
    }
    assert got["not_null(id)"] == (0, True)
    assert got["not_null(k)"] == (1, False)
    assert got["unique_key(id)"] == (1, False)      # id=2 twice
    assert got["in_range(v,0.0,100.0)"] == (1, False)  # -5.0
    assert got["in_set(k)"] == (0, True)            # null k is not a violation


def test_referential_integrity_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    got = {
        r.orphan_key: r.n_rows
        for r in referential_integrity(child, "fk", parent, "pk").collect()
    }
    assert got == {9: 1}  # null fk excluded; 1 and 2 resolve


def test_checks_single_aggregate_plan(spark):
    from etl_weather_spark.plans.explain import read_schema_columns

    df = _sample(spark)
    out = run_checks(df, [not_null("id"), unique_key("id"), in_range("v", 0, 1)])
    # one aggregate over the source: createDataFrame has no scan, so
    # assert the plan has exactly one Aggregate pair (partial+final)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1, plan
