"""Ingestion layer: tolerant readers that produce schema-strict silver tables."""

from etl_weather_spark.sources.openmeteo import (
    HOURLY_AIR_FIELDS,
    HOURLY_WEATHER_FIELDS,
    normalize_hourly,
    read_raw_json,
)

__all__ = [
    "HOURLY_AIR_FIELDS",
    "HOURLY_WEATHER_FIELDS",
    "normalize_hourly",
    "read_raw_json",
]
