"""Single source of truth for every threshold/constant the engine uses.

The reference duplicates its PM2.5 binning logic in five places
(transform.py:32-48, report.py:52-66, viz.py:126-134, app.js:237-246,
app.js:301-309); here each constant is defined once and imported
everywhere.
"""

from __future__ import annotations

# PM2.5 (µg/m³) category bin edges — upper-inclusive thresholds, in order.
# Reference: transform.py:32-48 (Indonesian labels).
PM25_BINS: list[tuple[float, str]] = [
    (12.0, "Baik"),
    (35.4, "Sedang"),
    (55.4, "Tidak sehat (sensitif)"),
    (150.4, "Tidak sehat"),
    (250.4, "Sangat tidak sehat"),
]
PM25_TOP_CATEGORY = "Berbahaya"
PM25_NULL_CATEGORY = "Tidak diketahui"

# 3-bin AQI status used by the reference's viz layer (viz.py:126-134).
AQI_BINS: list[tuple[float, str]] = [
    (12.0, "Good"),
    (55.4, "Moderate"),
]
AQI_TOP_CATEGORY = "Unhealthy"

# Derived daily flags (report.py:36-49, app.js:326-328).
HOT_DAY_TEMP_C = 33.0
HEAVY_RAIN_MM = 20.0
UNHEALTHY_PM25 = 35.4
MODERATE_PM25 = 35.4
SENSITIVE_PM25 = 55.4
RAINY_DAY_MM = 0.0          # a day is "rainy" if total_rain > 0 (report.py:105)
RAINY_DAYS_ADVICE_MIN = 3   # recommendation trigger (report.py:43-46)

# Recommendation strings (report.py:28-49).
ADVICE_MASK = "Kualitas udara buruk, gunakan masker saat keluar."
ADVICE_MASK_SENSITIVE = "Udara kurang baik untuk kelompok sensitif, pertimbangkan masker."
ADVICE_HEAT = "Cuaca panas, minum air yang cukup."
ADVICE_RAIN = "Sering hujan, siapkan payung."
ADVICE_DEFAULT = "Kondisi cuaca dan udara relatif nyaman."

# Rolling-window defaults (viz.py:77, app.js:859-872).
TRAILING_MA_DAYS = 7
CENTERED_MA_WINDOW = 3

# 16-point compass labels (app.js:187-194).
COMPASS_POINTS: list[str] = [
    "N", "NNE", "NE", "ENE", "E", "ESE", "SE", "SSE",
    "S", "SSW", "SW", "WSW", "W", "WNW", "NW", "NNW",
]

# WMO weather-code → description ranges (app.js:169-185).
# (lo, hi, description) — inclusive ranges, first match wins.
WMO_CODE_RANGES: list[tuple[int, int, str]] = [
    (0, 0, "Clear"),
    (1, 2, "Partly cloudy"),
    (3, 3, "Overcast"),
    (45, 48, "Fog"),
    (51, 57, "Drizzle"),
    (61, 67, "Rain"),
    (71, 77, "Snow"),
    (80, 82, "Rain showers"),
    (85, 86, "Snow showers"),
    (95, 99, "Thunderstorms"),
]
WMO_UNKNOWN = "Unknown"
