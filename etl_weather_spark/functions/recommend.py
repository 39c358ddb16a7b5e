"""Rule-based recommendation text (reference parity: C3, report.py:28-49).

The reference builds a list of advice strings from threshold triggers and
joins with spaces, falling back to a default. Expressed here as
``concat_ws`` over ``when`` clauses + ``coalesce(nullif(...))`` — a single
JVM-side expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_weather_spark import config


def recommendation(
    pm25_avg: Column,
    temp_max: Column,
    rainy_days: Column,
) -> Column:
    """Concatenate triggered advice strings; default text if none trigger.

    Trigger order matches reference report.py:28-49:
    pm25>55.4 → mask; elif pm25>35.4 → sensitive-mask; temp_max>33 → heat;
    rainy_days>=3 → umbrella.
    """
    mask = (
        F.when(pm25_avg > config.SENSITIVE_PM25, F.lit(config.ADVICE_MASK))
        .when(pm25_avg > config.MODERATE_PM25, F.lit(config.ADVICE_MASK_SENSITIVE))
    )
    heat = F.when(temp_max > config.HOT_DAY_TEMP_C, F.lit(config.ADVICE_HEAT))
    rain = F.when(rainy_days >= config.RAINY_DAYS_ADVICE_MIN, F.lit(config.ADVICE_RAIN))
    joined = F.concat_ws(" ", mask, heat, rain)
    return F.coalesce(F.nullif(joined, F.lit("")), F.lit(config.ADVICE_DEFAULT))
