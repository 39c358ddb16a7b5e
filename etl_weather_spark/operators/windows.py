"""Window/analytic operators (reference parity: W1-W4, A6, A8).

Scale notes: every function takes explicit partition keys. An
unpartitioned ``Window.orderBy`` collapses to a single task — fine for
one city's 16-day series, catastrophic at 100 TB — so callers must
partition by city/entity; the helpers default to that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import rnd


def _frame_avg(value_col: str, frame, exact_scale: int | None):
    """avg over a window frame; with exact_scale, decimal-sum / count —
    order-independent and bitwise-reproducible across engines (see
    functions/rounding.py)."""
    if exact_scale is None:
        return F.avg(value_col).over(frame)
    # scaled-long decimal accumulation: same value, compact-decimal fast
    # path (see functions/rounding.dsum)
    sc = 10 ** exact_scale
    scaled = F.floor(F.col(value_col) * sc + F.lit(0.5)).cast("long").cast("decimal(28,0)")
    s = F.sum(scaled).over(frame).cast("double") / sc
    return s / F.count(value_col).over(frame)


def _spec(partition_by: list[str], order_by: str) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(order_by)


def trailing_mean(
    df: DataFrame,
    value_col: str,
    out_col: str,
    *,
    order_by: str = "date",
    partition_by: list[str] | None = None,
    window: int = 7,
    min_periods: int | None = None,
    exact_scale: int | None = None,
) -> DataFrame:
    """Trailing moving average with pandas ``rolling(window).mean()`` parity.

    Reference viz.py:77 uses pandas' default ``min_periods=window`` —
    the first ``window-1`` rows yield null. Spark's ``rowsBetween``
    averages partial frames, so we gate on the frame row count
    (SURVEY.md §7.3).
    """
    min_periods = window if min_periods is None else min_periods
    frame = _spec(partition_by or [], order_by).rowsBetween(-(window - 1), 0)
    avg = _frame_avg(value_col, frame, exact_scale)
    cnt = F.count(value_col).over(frame)
    return df.withColumn(out_col, F.when(cnt >= min_periods, rnd(avg, 2)))


def centered_mean(
    df: DataFrame,
    value_col: str,
    out_col: str,
    *,
    order_by: str = "date",
    partition_by: list[str] | None = None,
    half_width: int = 1,
    exact_scale: int | None = None,
) -> DataFrame:
    """Centered moving average (reference app.js:859-872, window=3 centered).

    The JS version averages whatever neighbors exist (edges use partial
    windows), so no min_periods gate here.
    """
    frame = _spec(partition_by or [], order_by).rowsBetween(-half_width, half_width)
    return df.withColumn(out_col, rnd(_frame_avg(value_col, frame, exact_scale), 2))


def minmax_normalize(
    df: DataFrame,
    value_col: str,
    out_col: str,
    *,
    partition_by: list[str],
) -> DataFrame:
    """Per-group min-max normalization, zero-range guarded to 1.

    Reference app.js:851-857: ``(v - min)/(max - min)``, and if
    max == min every value maps to 1.
    """
    w = Window.partitionBy(*partition_by)
    mn = F.min(value_col).over(w)
    mx = F.max(value_col).over(w)
    norm = F.when(mx == mn, F.lit(1.0)).otherwise((F.col(value_col) - mn) / (mx - mn))
    return df.withColumn(out_col, rnd(norm, 4))


def rank_by(
    df: DataFrame,
    order_col: str | Column,
    out_col: str = "rank",
    *,
    partition_by: list[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Dense ranking by a metric (reference app.js:881,984-985 top/second/bottom).

    Scale note: a global (unpartitioned) rank over an *aggregated* table
    (one row per city) is fine — the single-task window sees only the
    group count, not the raw data.
    """
    col = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*(partition_by or [])).orderBy(col.desc() if descending else col.asc())
    return df.withColumn(out_col, F.row_number().over(w))


def pct_diff_vs_next(
    df: DataFrame,
    value_col: str,
    out_col: str = "pct_diff_vs_next",
    *,
    rank_col: str = "rank",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """% difference of each row vs the next-ranked row (reference app.js:975-979)."""
    w = Window.partitionBy(*(partition_by or [])).orderBy(rank_col)
    nxt = F.lead(value_col).over(w)
    return df.withColumn(
        out_col,
        rnd((F.col(value_col) - nxt) / F.abs(nxt) * 100.0, 1),
    )
