"""Streaming Population-Stability-Index monitor: per-micro-batch PSI
against a REFERENCE histogram — the continuous form of
``queries.psi_drift_audit`` and the integrating companion to
``streaming/drift_monitor``'s KS (KS alarms on the single worst CDF
gap; PSI accumulates the WHOLE distribution shift, so a broad gentle
drift that never opens one large gap still trips it — the model-risk
convention: <0.1 stable, 0.1–0.25 moderate, >0.25 shifted).

Design mirrors the drift monitor deliberately: the reference is the
SAME quantized (value, count) histogram artifact (one reference feeds
both monitors), the per-batch statistic is the SAME
``psi_from_histograms`` helper the batch audit algebra is proven
against (asserted equal in tests), NULL values carry no histogram
mass, and each trigger overwrites one ``batch_id=N`` row so replays
rewrite identical bytes. A non-empty all-NULL batch writes an explicit
``all_null`` alarm row instead of crashing (the drift monitor's
learned lesson, designed in from the start here).

Scale: per trigger the work is one value-keyed partial agg over the
BATCH plus a bounded union join against the reference; the reference
never rescans; state lives in the reference artifact, not the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_weather_spark.streaming.drift_monitor import reference_histogram

__all__ = ["batch_psi_stat", "process_psi_batch", "stream_psi_monitor"]


def batch_psi_stat(
    batch: DataFrame,
    ref_hist: DataFrame,
    *,
    value_col: str = "n_chars",
    threshold: float = 0.25,
    bucket_width: float | None = None,
) -> DataFrame:
    """One-row (n_rows, psi6, shifted): psi_from_histograms with the
    reference side precomputed. An empty (or all-NULL) batch yields
    n_rows=0 with a NULL statistic — visible, never a false alarm.

    Honors the ``bucket_width`` bound into the reference artifact the
    same way batch_ks_stat does: a monitor configured with a different
    width than the persisted reference refuses loudly.
    """
    from etl_weather_spark.operators.ks import psi_from_histograms

    if "bucket_width" in ref_hist.columns:
        widths = [
            r.bucket_width
            for r in ref_hist.select("bucket_width").distinct().collect()
        ]
        ref_width = widths[0] if widths else None
        if (
            bucket_width is not None
            and ref_width is not None
            and float(bucket_width) != float(ref_width)
        ):
            raise ValueError(
                f"reference histogram was built with bucket_width="
                f"{ref_width}, monitor configured with {bucket_width} — "
                "the comparison would silently match nothing"
            )
        bucket_width = ref_width if ref_width is not None else bucket_width
        ref_hist = ref_hist.drop("bucket_width")
    bh = reference_histogram(
        batch, value_col=value_col, bucket_width=bucket_width
    ).drop("bucket_width")
    psi = psi_from_histograms(ref_hist, bh, threshold=threshold)
    return psi.select(
        F.col("n_b").alias("n_rows"),
        F.when(F.col("n_b") > 0, F.col("psi6")).alias("psi6"),
        (F.col("shifted") & (F.col("n_b") > 0)).alias("shifted"),
    )


def process_psi_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    ref_hist: DataFrame,
    stats_dir: str,
    value_col: str = "n_chars",
    threshold: float = 0.25,
    bucket_width: float | None = None,
) -> None:
    """foreachBatch body — idempotent: ``batch_id=N`` overwrites with
    identical bytes on replay."""
    if batch_df.isEmpty():
        return
    row = batch_psi_stat(
        batch_df,
        ref_hist,
        value_col=value_col,
        threshold=threshold,
        bucket_width=bucket_width,
    ).collect()[0]
    spark = batch_df.sparkSession
    # A non-empty batch whose value_col is entirely NULL has zero
    # histogram mass — the upstream-schema-break case — and must
    # surface as an explicit all_null alarm row, never a float(None)
    # crash (n_rows can itself be NULL when both histograms are empty;
    # tolerate None like the drift monitor does).
    all_null = int(row.n_rows or 0) == 0
    out = spark.createDataFrame(
        [(
            int(batch_id),
            int(row.n_rows or 0),
            None if all_null else float(row.psi6),
            bool(row.shifted),
            all_null,
        )],
        "batch_id long, n_rows long, psi6 double, shifted boolean, "
        "all_null boolean",
    )
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"batch_id={batch_id}")
    )


def stream_psi_monitor(
    docs_stream: DataFrame,
    *,
    ref_hist: DataFrame,
    stats_dir: str,
    checkpoint_dir: str,
    value_col: str = "n_chars",
    threshold: float = 0.25,
    bucket_width: float | None = None,
):
    """Wire the monitor onto a document stream: one PSI row per
    micro-batch under ``stats_dir``."""
    ref = ref_hist.localCheckpoint(eager=False)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        process_psi_batch(
            batch_df,
            batch_id,
            ref_hist=ref,
            stats_dir=stats_dir,
            value_col=value_col,
            threshold=threshold,
            bucket_width=bucket_width,
        )

    return (
        docs_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
