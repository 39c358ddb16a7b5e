"""Cross-engine fuzz: random tables through the same plan on Spark and
DuckDB.

The query registry's oracles run on FIXED corpora; this fuzzes the
determinism discipline itself (decimal-exact sums, floor-form rounding,
null handling) on hypothesis-generated data — groups with all-null
values, negative/huge/tiny doubles, duplicate keys, empty groups. A
failure here means the rnd/dsum/davg contract has a hole the curated
testdata never hits.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import davg, dsum, rnd

# doubles that exercise accumulation-order sensitivity without leaving
# the decimal(28,2) envelope the dsum contract promises
VALUES = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
)

ROWS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), VALUES),
    min_size=0,
    max_size=60,
)


def _norm(v):
    if v is None:
        return "None"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    return str(v)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(rows=ROWS)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grouped_agg_matches_duckdb_on_random_data(spark, duck, rows):
    sdf = spark.createDataFrame(
        [(k, None if v is None else float(round(v, 2))) for k, v in rows]
        or [(None, None)],
        "k int, v double",
    )
    if not rows:
        sdf = sdf.limit(0)
    got = (
        sdf.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            rnd(F.coalesce(dsum("v"), F.lit(0.0)), 2).alias("vsum"),
            rnd(davg("v"), 2).alias("vavg"),
            rnd(F.min("v"), 2).alias("vmin"),
            rnd(F.max("v"), 2).alias("vmax"),
        )
        .collect()
    )
    pdf = sdf.toPandas()
    duck.register("t_fuzz", pdf)
    exp = duck.execute(
        """
        SELECT k, COUNT(v) AS n,
               FLOOR((COALESCE(CAST(SUM(CAST((v) AS DECIMAL(28,2))) AS DOUBLE), 0.0)) * 100 + 0.5) / 100 AS vsum,
               FLOOR((CAST(SUM(CAST((v) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(v)) * 100 + 0.5) / 100 AS vavg,
               FLOOR((MIN(v)) * 100 + 0.5) / 100 AS vmin,
               FLOOR((MAX(v)) * 100 + 0.5) / 100 AS vmax
        FROM t_fuzz GROUP BY k
        """
    ).fetchall()
    duck.unregister("t_fuzz")
    ms = sorted("|".join(_norm(x) for x in tuple(r)) for r in got)
    md = sorted("|".join(_norm(x) for x in r) for r in exp)
    assert ms == md, f"\nspark={ms}\nduck ={md}"
