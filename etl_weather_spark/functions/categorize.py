"""Categorical/binning expressions (reference parity: C2, C8, C9).

All are chained ``when()`` expressions — constant-folded and codegen'd by
Catalyst, zero Python per row. At 100 TB a ``when`` chain over a scanned
column costs nothing beyond the scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_weather_spark import config


def _bin_chain(
    col: Column,
    bins: list[tuple[float, str]],
    top: str,
    null_label: str | None,
) -> Column:
    """Upper-inclusive threshold binning: value <= edge → label."""
    expr = F.when(col.isNull(), F.lit(null_label)) if null_label is not None else None
    for edge, label in bins:
        clause = col <= F.lit(edge)
        expr = F.when(clause, F.lit(label)) if expr is None else expr.when(clause, F.lit(label))
    return expr.otherwise(F.lit(top))


def pm25_category(pm25: Column) -> Column:
    """PM2.5 µg/m³ → 6 Indonesian AQI categories.

    Parity with reference transform.py:32-48 (null → "Tidak diketahui"
    first, then ≤12 Baik, ≤35.4 Sedang, ≤55.4 Tidak sehat (sensitif),
    ≤150.4 Tidak sehat, ≤250.4 Sangat tidak sehat, else Berbahaya).
    """
    return _bin_chain(pm25, config.PM25_BINS, config.PM25_TOP_CATEGORY, config.PM25_NULL_CATEGORY)


def aqi_status(pm25: Column) -> Column:
    """3-bin chart status (reference viz.py:126-134): Good/Moderate/Unhealthy."""
    return _bin_chain(pm25, config.AQI_BINS, config.AQI_TOP_CATEGORY, None)


def weather_code_desc(code: Column) -> Column:
    """WMO weather code → text description (reference app.js:169-185).

    Range-cases as a when-chain; for a genuinely large decode table this
    would be a broadcast-joined dimension instead.
    """
    expr: Column | None = None
    for lo, hi, desc in config.WMO_CODE_RANGES:
        clause = code.between(F.lit(lo), F.lit(hi))
        expr = F.when(clause, F.lit(desc)) if expr is None else expr.when(clause, F.lit(desc))
    assert expr is not None
    return expr.otherwise(F.lit(config.WMO_UNKNOWN))


def wind_compass(degrees: Column) -> Column:
    """Wind direction degrees → 16-point compass label.

    Parity with reference app.js:187-194:
    ``idx = round(((d % 360) + 360) % 360 / 22.5) % 16``.
    Implemented with arithmetic + element_at over a literal array —
    fully JVM-side.
    """
    norm = ((degrees % 360) + 360) % 360
    idx = (F.round(norm / 22.5, 0).cast("int") % 16)
    points = F.array(*[F.lit(p) for p in config.COMPASS_POINTS])
    return F.element_at(points, idx + 1)


def is_hot_day(temp_max: Column) -> Column:
    """temp_max > 33°C (reference report.py:39, app.js:326)."""
    return temp_max > F.lit(config.HOT_DAY_TEMP_C)


def is_heavy_rain(total_rain: Column) -> Column:
    """total_rain > 20mm/day (flag expected by reference app.js:327)."""
    return total_rain > F.lit(config.HEAVY_RAIN_MM)


def is_unhealthy_pm25(pm25_avg: Column) -> Column:
    """pm25_avg > 35.4 (reference app.js:328,644; report.py:36)."""
    return pm25_avg > F.lit(config.UNHEALTHY_PM25)


def pct_diff(a: Column, b: Column, decimals: int = 1) -> Column:
    """(a-b)/|b|*100 rounded (reference app.js:977-978)."""
    return F.round((a - b) / F.abs(b) * 100.0, decimals)
