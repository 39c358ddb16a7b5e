"""Table profiling and declarative data-quality checks.

A 100 TB training pipeline ingests tables it didn't author; before any
compute touches them it needs (a) a cheap per-column profile — null
rates, cardinalities, ranges — and (b) enforceable expectations
(primary-key uniqueness, referential integrity, value domains), the
way Deequ/Great Expectations front a lake. Both are expressed here as
ONE aggregate pass per table (never a per-column job each), so the
profile costs a single scan at any scale.

The reference's closest analog is its tolerant-ingestion shape probing
(SURVEY §1.3, web.py:51-76): it sniffs payload shapes ad hoc; here the
same caution is a declared, testable relation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_weather_spark.functions.rounding import rnd


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, null_frac,
    n_distinct, min_str, max_str) — one row per column, ONE scan.

    All columns' aggregates ride a single ``agg(...)`` so Spark computes
    them in one partial+final pass; the long format comes from a stack
    of the flat result (driver-side explode of one row, not a shuffle).
    min/max are rendered as strings so heterogeneous column types share
    one schema. n_distinct is exact; swap in approx_count_distinct when
    profiling at the 100 TB tier.
    """
    columns = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    flat = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            rnd(F.col(f"__null_{c}") / F.col("__n"), 6).alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_str"),
            F.col(f"__max_{c}").alias("max_str"),
        )
        for c in columns
    ]
    return flat.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


@dataclass(frozen=True)
class Check:
    """A named expectation evaluated as aggregate expressions.

    ``violations`` counts offending rows; the check passes when it is 0.
    """

    name: str
    violations: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.count(F.when(F.col(col).isNull(), 1)))


def unique_key(*cols: str) -> Check:
    """0 when (cols) is a primary key: total rows == distinct keys."""
    return Check(
        f"unique_key({','.join(cols)})",
        F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(
        f"in_range({col},{lo},{hi})",
        F.count(F.when(~F.col(col).between(lo, hi), 1)),
    )


def in_set(col: str, values: list) -> Check:
    return Check(
        f"in_set({col})",
        F.count(F.when(~F.col(col).isin(values) & F.col(col).isNotNull(), 1)),
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in ONE aggregate pass over ``df``.

    Returns (check, violations, passed) — long format via the same
    flat-agg + explode trick as :func:`profile_table`.
    """
    flat = df.agg(
        *[c.violations.cast("long").alias(f"__v_{i}") for i, c in enumerate(checks)]
    )
    rows = [
        F.struct(
            F.lit(c.name).alias("check"),
            F.col(f"__v_{i}").alias("violations"),
            (F.col(f"__v_{i}") == 0).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return flat.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def referential_integrity(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphan foreign-key rows: child keys with no parent (left_anti).

    Kept as its own relation (not a Check) because it needs a join, not
    an aggregate — at scale the parent key set broadcasts when small,
    else this is one co-partitioned anti join.
    """
    return (
        child.select(fk)
        .filter(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)), on=fk, how="left_anti")
        .groupBy(F.col(fk).alias("orphan_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


__all__ = [
    "Check",
    "in_range",
    "in_set",
    "not_null",
    "profile_table",
    "referential_integrity",
    "run_checks",
    "unique_key",
]


# type-module reference kept for documentation: profile output schema
PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_null", T.LongType()),
        T.StructField("null_frac", T.DoubleType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("min_str", T.StringType()),
        T.StructField("max_str", T.StringType()),
    ]
)
