"""Streaming sketch maintenance: a persisted Count-Min Sketch kept
current by foreachBatch — the continuous form of the batch rollup in
``queries.cms_user_freq``.

Each micro-batch builds its own partial CMS (one distributed pass over
the batch, ``operators/sketches.cms_build``) and ADDS it into the
stored matrix, so the artifact answers point-frequency queries over
everything ingested so far without any rescan. Mergeability is what
makes the maintenance loop O(batch), not O(history).

Exactly-once discipline (same contract as streaming/incremental_dedup):
foreachBatch is at-least-once, so the stored artifact carries the set
of applied batch ids; a replayed batch finds its id and SKIPS the add —
double-counting a batch would silently inflate every estimate, which
no downstream check could detect (CMS only promises estimate ≥ truth).

Persistence is a single .npz (matrix + applied ids) written
atomically via tmp+rename; at cluster scale put it next to the
snapshot tables on the object store (a conditional PUT replaces the
rename) — it is a few MB, not data-sized.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame

from etl_weather_spark.operators.sketches import cms_build

__all__ = ["load_cms_state", "process_cms_batch", "stream_maintain_cms"]


def load_cms_state(path: str, *, depth: int, width: int):
    """(matrix, applied_batch_ids) — zeros/empty when absent."""
    if not os.path.exists(path):
        return np.zeros((depth, width), dtype=np.int64), set()
    with np.load(path) as z:
        return z["m"].copy(), set(int(b) for b in z["applied"])


def _save_cms_state(path: str, m: np.ndarray, applied: set) -> None:
    tmp = f"{path}.tmp.{os.getpid()}.npz"  # savez appends .npz otherwise
    np.savez(tmp[:-4], m=m, applied=np.array(sorted(applied), dtype=np.int64))
    os.replace(tmp, path)


def process_cms_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    key_col: str,
    depth: int = 5,
    width: int = 2048,
) -> None:
    """The foreachBatch body — re-callable: a replayed batch id is a
    no-op (its partial was already added)."""
    m, applied = load_cms_state(state_path, depth=depth, width=width)
    if batch_id in applied:
        return
    partial = cms_build(batch_df, key_col, depth=depth, width=width)
    _save_cms_state(state_path, m + partial, applied | {batch_id})


def stream_maintain_cms(
    stream: DataFrame,
    *,
    state_path: str,
    checkpoint: str,
    key_col: str,
    depth: int = 5,
    width: int = 2048,
):
    """Wire a stream to the maintenance loop (availableNow-friendly).

    Returns the started StreamingQuery; the caller awaits termination.
    """
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: process_cms_batch(
                df,
                bid,
                state_path=state_path,
                key_col=key_col,
                depth=depth,
                width=width,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
