"""Physical-plan assertions: make scale properties testable.

"Would this plan survive 100×?" is a question the plan itself answers:
filters must reach the scan (PushedFilters), projections must prune
(ReadSchema), small dims must broadcast (BroadcastHashJoin), expressions
must stay in whole-stage codegen. These helpers turn those properties
into test assertions so a regression (e.g. a UDF silently breaking
pushdown) fails CI instead of melting a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning ``fragment``."""
    plan = formatted_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line and "PushedFilters: []" not in line
    )


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (pruning check)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rstrip(">")
            cols = [f.split(":")[0] for f in schema.split(",") if ":" in f]
            out.append(cols)
    return out


def count_occurrences(df: DataFrame, operator: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin',
    'SortMergeJoin', 'Exchange', 'HashAggregate') in the plan."""
    return formatted_plan(df).count(operator)


def uses_broadcast_join(df: DataFrame) -> bool:
    return count_occurrences(df, "BroadcastHashJoin") > 0


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final plan (AQE may reuse)."""
    plan = formatted_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Broadcast" not in line and "Reused" not in line)


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when hash aggregation runs map-side partials before the shuffle."""
    plan = formatted_plan(df)
    return "partial_" in plan or "Partial" in plan


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters lines from file scans (partition-pruning check)."""
    return [
        line.strip()
        for line in formatted_plan(df).splitlines()
        if "PartitionFilters" in line
    ]
