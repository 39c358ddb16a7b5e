"""The weather-pipeline spine: hourly (silver) → daily (gold) → summary.

Reference parity, expressed as one lazy DataFrame chain per stage:

- :func:`merge_hourly` — J1 full-outer equi-join of weather and air
  hourly tables on (city, time)  (transform.py:77,169)
- :func:`daily_from_hourly` — A1 group-by-day multi-agg + C4/C5
  round/fill + C2 categorize + derived boolean flags the reference
  frontend expects but its backend never computes (app.js:326-328)
- :func:`summary_from_daily` — A3-A5 global aggregates incl. max_by
  wettest day, A4 count_if rainy days, C3 recommendation
  (report.py:81-106)

Scale notes:
- The hourly⟗air join keys on (city, time). Both sides are written
  partitioned by city/date, so at 100 TB this is a co-partitioned
  sort-merge join with partition pruning on both sides; AQE handles city
  skew (a megacity's sensors vs a village).
- daily agg is a hash aggregate with map-side partial aggregation —
  shuffle carries one row per (city, date) per mapper, not raw rows.
- summary is a single-group agg: partials reduce to one row; driver
  collects O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_spark import config
from etl_weather_spark.functions.categorize import (
    is_heavy_rain,
    is_hot_day,
    is_unhealthy_pm25,
    pm25_category,
)
from etl_weather_spark.functions.recommend import recommendation

#: canonical hourly metric columns (silver schema, FIXTURES.md §2.1)
HOURLY_METRICS = ["temp", "rain", "rh", "wind", "feels_like", "wcode", "dew_point", "wind_dir"]
AIR_METRICS = ["pm25", "pm10"]


def merge_hourly(weather: DataFrame, air: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Full-outer join weather and air hourly tables on (city, time).

    Preserves hours present in only one source (reference transform.py:77
    uses how='outer'); null time rows are dropped afterwards (F1,
    transform.py:86,189) and ``date`` is derived (P4).
    """
    keys = keys or ["city", "time"]
    merged = weather.join(air, on=keys, how="outer")
    return (
        merged.filter(F.col("time").isNotNull())
        .withColumn("date", F.to_date("time"))
    )


def daily_from_hourly(hourly: DataFrame, group_keys: list[str] | None = None) -> DataFrame:
    """Per (city, date): min/max temp, total rain, mean pm25/pm10 + category + flags.

    Matches reference transform.py:89-109 exactly: named aggs, total_rain
    null→0.0, round(2) everywhere, PM2.5 categorize; plus the
    is_hot_day / is_heavy_rain / is_unhealthy_pm25 flags (FIXTURES.md
    §2.2) promoted to real gold columns.
    """
    group_keys = group_keys or ["city", "date"]
    daily = hourly.groupBy(*group_keys).agg(
        F.round(F.min("temp"), 2).alias("temp_min"),
        F.round(F.max("temp"), 2).alias("temp_max"),
        F.round(F.coalesce(F.sum("rain"), F.lit(0.0)), 2).alias("total_rain"),
        F.round(F.avg("pm25"), 2).alias("pm25_avg"),
        F.round(F.avg("pm10"), 2).alias("pm10_avg"),
    )
    return (
        daily.withColumn("pm25_category", pm25_category(F.col("pm25_avg")))
        .withColumn("is_hot_day", F.coalesce(is_hot_day(F.col("temp_max")), F.lit(False)))
        .withColumn("is_heavy_rain", F.coalesce(is_heavy_rain(F.col("total_rain")), F.lit(False)))
        .withColumn(
            "is_unhealthy_pm25",
            F.coalesce(is_unhealthy_pm25(F.col("pm25_avg")), F.lit(False)),
        )
        .orderBy(*group_keys)
    )


def summary_from_daily(daily: DataFrame, group_keys: list[str] | None = None) -> DataFrame:
    """Period summary per city: global min/max/mean, wettest day (max_by), rainy-day count.

    Reference report.py:81-106; rainy day = total_rain > 0 (A4 count_if),
    wettest day = argmax(total_rain) (A5 max_by). Adds the C3
    recommendation text.
    """
    group_keys = group_keys if group_keys is not None else ["city"]
    grouped = daily.groupBy(*group_keys) if group_keys else daily.groupBy()
    summary = grouped.agg(
        F.round(F.min("temp_min"), 2).alias("period_temp_min"),
        F.round(F.max("temp_max"), 2).alias("period_temp_max"),
        F.round(F.avg("pm25_avg"), 2).alias("period_pm25_avg"),
        F.max_by("date", "total_rain").alias("wettest_date"),
        F.round(F.max("total_rain"), 2).alias("wettest_rain"),
        F.sum(
            F.when(F.col("total_rain") > config.RAINY_DAY_MM, 1).otherwise(0)
        ).alias("rainy_days"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return summary.withColumn(
        "recommendation",
        recommendation(
            F.col("period_pm25_avg"), F.col("period_temp_max"), F.col("rainy_days")
        ),
    )
