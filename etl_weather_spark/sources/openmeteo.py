"""Columnar-arrays JSON → hourly rows (reference parity: P1, S6).

Open-Meteo documents are a struct of *parallel arrays*, one element per
hour (column-major JSON):

    {"hourly": {"time": [...], "temperature_2m": [...], ...}}

The reference normalizes with a tolerant pandas builder
(transform.py:18-29 ``_safe_hourly_frame``): any metric array that is
missing — or whose length mismatches ``time`` — becomes an all-null
column. We reproduce those semantics declaratively:

1. read with a permissive schema (missing keys → null arrays),
2. null out length-mismatched arrays (``size(arr) != size(time)``),
3. ``posexplode(time)`` + per-metric ``element_at`` — one shuffle-free
   generator, then column pruning applies as usual.

Scale note: one input document is one city-fetch (≤384 hourly elements),
so explode fan-out is bounded and embarrassingly parallel across
documents; no shuffle is introduced — the plan stays a single
scan→generate→project stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Field → (raw name, canonical name) maps; renames per reference
# transform.py:73-74,155-167.
HOURLY_WEATHER_FIELDS: dict[str, str] = {
    "temperature_2m": "temp",
    "precipitation": "rain",
    "relative_humidity_2m": "rh",
    "windspeed_10m": "wind",
    "apparent_temperature": "feels_like",
    "weathercode": "wcode",
    "dew_point_2m": "dew_point",
    "winddirection_10m": "wind_dir",
}
HOURLY_AIR_FIELDS: dict[str, str] = {
    "pm2_5": "pm25",
    "pm10": "pm10",
}


def _raw_schema(fields: dict[str, str]) -> T.StructType:
    hourly = T.StructType(
        [T.StructField("time", T.ArrayType(T.StringType()))]
        + [T.StructField(raw, T.ArrayType(T.DoubleType())) for raw in fields]
    )
    return T.StructType(
        [
            T.StructField("city", T.StringType()),
            T.StructField("ingest_ts", T.TimestampType()),
            T.StructField("hourly", hourly),
        ]
    )


def read_raw_json(spark: SparkSession, path: str, fields: dict[str, str]) -> DataFrame:
    """Read raw Open-Meteo-shaped JSON documents with a permissive schema.

    Missing metric keys become null arrays (the conform step in
    :func:`normalize_hourly` turns them into null columns), matching the
    reference's "Missing fields will be left as empty values"
    (transform.py:121-125).
    """
    return spark.read.schema(_raw_schema(fields)).option("multiLine", "true").json(path)


def _conformed(arr: Column, time_arr: Column) -> Column:
    """Null out a metric array whose length mismatches time (transform.py:24-28)."""
    return F.when(F.size(arr) == F.size(time_arr), arr)


def normalize_hourly(raw: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Struct-of-parallel-arrays → one row per (city, hour).

    Output columns: ``city, ingest_ts, time`` (timestamp, null-on-parse-
    error per pd.to_datetime(errors='coerce')) + the canonical metric
    names from ``fields`` as nullable doubles.
    """
    h = F.col("hourly")
    time_arr = h["time"]
    exploded = raw.select(
        "city",
        "ingest_ts",
        F.posexplode_outer(time_arr).alias("pos", "time_str"),
        *[_conformed(h[raw_name], time_arr).alias(f"__{canon}") for raw_name, canon in fields.items()],
    )
    return exploded.select(
        "city",
        "ingest_ts",
        F.to_timestamp("time_str").alias("time"),
        *[
            F.element_at(F.col(f"__{canon}"), F.col("pos") + 1).alias(canon)
            for canon in fields.values()
        ],
    )


# ---------------------------------------------------------------------------
# Ingestion-job retry (reference parity: S5, fetch.py:21-37)
# ---------------------------------------------------------------------------


class NetworkError(RuntimeError):
    """Raised when an ingestion fetch exhausts its retries
    (reference fetch.py:18,37)."""


def with_retries(
    fn,
    *,
    retries: int = 3,
    initial_delay: float = 0.8,
    backoff: float = 1.6,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep=None,
):
    """Retry-with-exponential-backoff for ingestion calls (reference
    fetch.py:21-37: 3 attempts, delay 0.8 ×1.6, raises NetworkError).

    This wraps the DRIVER-side landing job (HTTP fetch → landed JSON
    document); once documents are landed, compute-side fault tolerance
    is Spark's own task retry (``spark.task.maxFailures``) — never a
    sleep inside an executor. ``sleep`` is injectable for tests.
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    delay = initial_delay
    last_exc: BaseException | None = None
    for _attempt in range(1, retries + 1):
        try:
            return fn()
        except retry_on as exc:  # noqa: PERF203 — retry loop
            last_exc = exc
            if _attempt < retries:
                do_sleep(delay)
                delay *= backoff
    raise NetworkError(f"fetch failed after {retries} attempts: {last_exc}") from last_exc
