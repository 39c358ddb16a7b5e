"""End-to-end spine parity on the reference's minimal fixtures.

Re-creates weather_min.json / air_min.json (FIXTURES.md §1) as
DataFrames, runs normalize → join → daily agg, and asserts the golden
rows from FIXTURES.md §2.3 exactly.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from etl_weather_spark.operators.pipeline import (
    daily_from_hourly,
    merge_hourly,
    summary_from_daily,
)
from etl_weather_spark.sources.openmeteo import (
    HOURLY_AIR_FIELDS,
    HOURLY_WEATHER_FIELDS,
    normalize_hourly,
    read_raw_json,
)

TIMES = ["2025-01-01T00:00", "2025-01-01T01:00", "2025-01-02T00:00"]
WEATHER_DOC = {
    "city": "bandung",
    "ingest_ts": "2025-01-02T12:00:00",
    "hourly": {
        "time": TIMES,
        "temperature_2m": [25.0, 26.5, 24.0],
        "precipitation": [0.0, 0.1, 2.4],
    },
}
AIR_DOC = {
    "city": "bandung",
    "ingest_ts": "2025-01-02T12:00:00",
    "hourly": {"time": TIMES, "pm2_5": [10.0, 20.0, 40.0], "pm10": [25.0, 30.0, 60.0]},
}


@pytest.fixture(scope="module")
def raw_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    (d / "weather.json").write_text(json.dumps(WEATHER_DOC))
    (d / "air.json").write_text(json.dumps(AIR_DOC))
    return str(d / "weather.json"), str(d / "air.json")


def test_normalize_pads_missing_and_mismatched(spark, raw_paths):
    weather_path, _ = raw_paths
    raw = read_raw_json(spark, weather_path, HOURLY_WEATHER_FIELDS)
    hourly = normalize_hourly(raw, HOURLY_WEATHER_FIELDS)
    rows = hourly.orderBy("time").collect()
    assert len(rows) == 3
    assert rows[0]["temp"] == 25.0 and rows[0]["rain"] == 0.0
    # fields absent from the doc → all-null columns (transform.py:18-29)
    assert all(r["rh"] is None and r["wind"] is None for r in rows)


def test_normalize_nulls_length_mismatch(spark, tmp_path):
    doc = {
        "city": "x",
        "ingest_ts": "2025-01-01T00:00:00",
        "hourly": {"time": TIMES, "temperature_2m": [1.0, 2.0]},  # len 2 != 3
    }
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(doc))
    hourly = normalize_hourly(
        read_raw_json(spark, str(p), HOURLY_WEATHER_FIELDS), HOURLY_WEATHER_FIELDS
    )
    rows = hourly.collect()
    assert len(rows) == 3 and all(r["temp"] is None for r in rows)


def test_daily_golden_rows(spark, raw_paths):
    weather_path, air_path = raw_paths
    hw = normalize_hourly(
        read_raw_json(spark, weather_path, HOURLY_WEATHER_FIELDS), HOURLY_WEATHER_FIELDS
    )
    ha = normalize_hourly(
        read_raw_json(spark, air_path, HOURLY_AIR_FIELDS), HOURLY_AIR_FIELDS
    )
    daily = daily_from_hourly(merge_hourly(hw, ha)).orderBy("date")
    rows = [r.asDict() for r in daily.collect()]
    assert len(rows) == 2
    d1, d2 = rows
    assert d1["date"] == dt.date(2025, 1, 1)
    assert (d1["temp_min"], d1["temp_max"], d1["total_rain"]) == (25.0, 26.5, 0.1)
    assert (d1["pm25_avg"], d1["pm10_avg"]) == (15.0, 27.5)
    assert d1["pm25_category"] == "Sedang"
    assert d1["is_hot_day"] is False and d1["is_unhealthy_pm25"] is False
    assert d2["date"] == dt.date(2025, 1, 2)
    assert (d2["temp_min"], d2["temp_max"], d2["total_rain"]) == (24.0, 24.0, 2.4)
    assert (d2["pm25_avg"], d2["pm10_avg"]) == (40.0, 60.0)
    assert d2["pm25_category"] == "Tidak sehat (sensitif)"
    assert d2["is_unhealthy_pm25"] is True


def test_summary(spark, raw_paths):
    weather_path, air_path = raw_paths
    hw = normalize_hourly(
        read_raw_json(spark, weather_path, HOURLY_WEATHER_FIELDS), HOURLY_WEATHER_FIELDS
    )
    ha = normalize_hourly(
        read_raw_json(spark, air_path, HOURLY_AIR_FIELDS), HOURLY_AIR_FIELDS
    )
    daily = daily_from_hourly(merge_hourly(hw, ha))
    s = summary_from_daily(daily).collect()[0].asDict()
    assert s["period_temp_min"] == 24.0 and s["period_temp_max"] == 26.5
    assert s["wettest_date"] == dt.date(2025, 1, 2) and s["wettest_rain"] == 2.4
    assert s["rainy_days"] == 2  # both days have total_rain > 0
    assert s["recommendation"] == "Kondisi cuaca dan udara relatif nyaman."
