"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]`` single-JVM, but every conf here is chosen
to also be the right default on a 1000-executor cluster reading 100 TB:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast-demotion decisions are made from real stats, not guesses.
- ``spark.sql.shuffle.partitions`` is only the *initial* number — AQE
  coalesces. On a real cluster set it ~2-3× total cores.
- Arrow execution for the few Pandas-UDF paths (multimodal decode,
  accent-stripping slugify) so Python round-trips are batched, not
  row-at-a-time.
- ANSI off: the reference's semantics are "coerce errors to null"
  (pd.to_numeric(errors='coerce'), transform.py:79-80); non-ANSI casts
  match that, and we use try_* functions where it matters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-weather-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # activate the vendored protobuf fallback (and its PYTHONPATH
    # export) BEFORE the JVM starts, so transformWithState's separately
    # launched Python runner processes inherit it
    from etl_weather_spark._vendor import ensure_protobuf

    ensure_protobuf()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # read TIMESTAMP(NANOS) parquet columns as long; loaders convert
        # to microsecond timestamps (matching DuckDB's ns→µs truncation)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
