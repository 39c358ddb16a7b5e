"""Stateful streaming operators — session windows and custom state.

The reference is batch/request-driven (SURVEY.md §2.14); these extend
the engine with the two stateful shapes a streaming deployment of the
same pipeline needs:

- :func:`session_user_agg` — per-key session windows
  (``F.session_window``). Declarative: Catalyst plans the session merge,
  the same expression runs in batch AND streaming (tested equal), and
  watermarks bound state.
- :func:`running_user_totals` — ``applyInPandasWithState``: arbitrary
  per-key state kept across micro-batches for logic session_window
  can't express (running totals emitted every batch, custom eviction).

Scale notes:
- session_window state is O(open sessions); the watermark closes and
  evicts sessions whose end < watermark. Keys are hash-partitioned, so
  state shards across executors — no driver bottleneck.
- applyInPandasWithState moves one Arrow batch per key-group per
  trigger through Python; keep the state row narrow (fixed-width
  numerics here) so the state store stays small and JVM<->Python
  transfer is bounded by the batch, not the history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import dsum, rnd

#: output schema of :func:`running_user_totals`
RUNNING_TOTALS_SCHEMA = (
    "user_id long, n_events long, total double, vmax double, batch_rows long"
)
#: state row kept per user across micro-batches
RUNNING_TOTALS_STATE = "n long, total double, vmax double"


def session_user_agg(
    events: DataFrame,
    *,
    gap: str = "2 hours",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session aggregate: sessions split when the inter-event
    gap reaches ``gap``; ``session_end`` = last event + gap (Spark's
    session_window end semantics).

    One expression for batch and streaming: pass ``watermark`` when the
    input is a stream (append mode requires it; it also evicts closed
    sessions from the state store).
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.coalesce(dsum("value"), F.lit(0.0)), 2).alias("vsum"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "vsum",
        )
    )


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Fold this trigger's rows for one user into (n, total, vmax) state
    and emit the updated running totals once per trigger."""
    (user_id,) = key
    n, total, vmax = state.get if state.exists else (0, 0.0, float("-inf"))
    batch_rows = 0
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        batch_rows += len(pdf)
        n += len(vals)
        total += float(vals.sum())
        if len(vals):
            vmax = max(vmax, float(vals.max()))
    state.update((n, total, vmax))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n_events": n,
                "total": round(total, 2),
                "vmax": vmax if vmax != float("-inf") else None,
                "batch_rows": batch_rows,
            }
        ]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum, max)
    across micro-batches, one output row per user per trigger.

    ``applyInPandasWithState`` is the escape hatch when built-in
    windowed aggs can't express the state machine (here: totals
    re-emitted every trigger with the per-trigger row count — an
    anomaly-feed / metrics-push shape).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key in the dedup state
    only until the watermark passes it — at 100 TB/day the state is
    O(keys per watermark window), not O(all keys ever), which is what
    makes exact dedup feasible on an unbounded stream (the streaming
    counterpart of queries.dedup_exact's fingerprint groupBy).
    """
    key_cols = key_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
