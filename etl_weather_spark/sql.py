"""Ad-hoc SQL surface: every corpus table as a named view + ``spark.sql``.

The reference exposes fixed endpoints only (web.py:366-569) — a user
who wants a new question answered edits Python. Here the whole engine
is also queryable declaratively: register the tables once and run any
ANSI SQL through Catalyst, which is the idiomatic Spark front door for
analysts and the piece that makes "switch to this repo" complete for
ad-hoc work (the named registry in :mod:`etl_weather_spark.queries`
stays the contract surface for the curated operators).

Scale: views are lazy — registration reads only parquet footers; every
SQL statement gets full Catalyst treatment (pushdown, pruning, AQE)
exactly like the DataFrame API, because both compile to the same plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_weather_spark.queries import load

#: every table the driver's corpus ships (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each corpus table as a temp view (events with the same
    nanos→µs timestamp conform that :func:`queries.load` applies, so
    SQL and DataFrame callers see identical schemas)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """One-shot helper: register views, then run ``statement``."""
    register_views(spark, sf_dir)
    return spark.sql(statement)
