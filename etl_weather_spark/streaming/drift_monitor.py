"""Streaming distribution-drift monitor: per-micro-batch two-sample
Kolmogorov–Smirnov statistic against a REFERENCE histogram — the
continuous form of ``queries.ks_drift_audit``, run at the ingestion
edge so a crawler or upstream format change is caught the batch it
lands, not at the next nightly audit.

Design: the reference distribution is captured ONCE as a quantized
(value, count) histogram (a tiny relation — bounded by value
cardinality, not rows) and joined against each batch's equally tiny
histogram; D = max_x |F_ref(x) − F_batch(x)| over the union of values,
gaps rounded at 6 dp — the SAME ``ks_from_histograms`` helper the
batch audit query runs, so the algebra literally cannot diverge
(asserted equal in tests). NULL values carry no histogram mass (both
sides drop them — engines order NULLs differently in cumulative
windows, so including them would break cross-engine parity). Each
trigger overwrites one (batch_id, n_rows, ks_stat6, drifted) row under
``batch_id=N``, so foreachBatch's at-least-once replays rewrite
content-identical stats (the idempotence contract of
streaming/corpus_ingest).

Scale: per trigger the work is one value-keyed partial agg over the
BATCH plus a tiny histogram-union join against the reference; the
reference never rescans. State lives in the reference artifact, not
the stream — restarts need no state-store recovery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reference_histogram", "batch_ks_stat", "stream_drift_monitor"]


def reference_histogram(
    docs: DataFrame,
    *,
    value_col: str = "n_chars",
    bucket_width: float | None = None,
) -> DataFrame:
    """Quantized (x, c) histogram of the reference corpus — the standing
    artifact the monitor compares every batch against (persist it to
    the lakehouse in production; it is value-cardinality-sized).

    ``bucket_width`` buckets x to ``floor(x / width)`` so a
    wide-ranging or floating-point value column stays bounded BY
    CONSTRUCTION (the ks_from_histograms discipline); pass the same
    width to the monitor so both sides bucket identically.
    """
    x = F.col(value_col).cast("long")
    if bucket_width is not None:
        x = F.floor(
            F.col(value_col).cast("double") / F.lit(float(bucket_width))
        ).cast("long")
    return (
        docs.select(x.alias("x"))
        .filter(F.col("x").isNotNull())
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def batch_ks_stat(
    batch: DataFrame,
    ref_hist: DataFrame,
    *,
    value_col: str = "n_chars",
    threshold: float = 0.2,
    bucket_width: float | None = None,
) -> DataFrame:
    """One-row (n_rows, ks_stat6, drifted): the exact KS algebra of
    queries.ks_drift_audit with the reference side precomputed.

    The cumulative window runs over the union of DISTINCT values of
    both histograms (never a row sort); missing values on either side
    contribute zero mass at that point, which is exactly the step-CDF
    semantics. An EMPTY batch yields n_rows=0, ks_stat6=NULL,
    drifted=false — a visible degenerate case, never a false alarm.
    """
    from etl_weather_spark.operators.ks import ks_from_histograms

    bh = reference_histogram(
        batch, value_col=value_col, bucket_width=bucket_width
    )
    ks = ks_from_histograms(ref_hist, bh, threshold=threshold)
    return ks.select(
        F.col("n_b").alias("n_rows"),
        F.when(F.col("n_b") > 0, F.col("ks_stat6")).alias("ks_stat6"),
        (F.col("drifted") & (F.col("n_b") > 0)).alias("drifted"),
    )


def process_drift_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    ref_hist: DataFrame,
    stats_dir: str,
    value_col: str = "n_chars",
    threshold: float = 0.2,
    bucket_width: float | None = None,
) -> None:
    """foreachBatch body — idempotent: ``batch_id=N`` overwrites with
    identical bytes on replay."""
    if batch_df.isEmpty():
        return
    row = batch_ks_stat(
        batch_df,
        ref_hist,
        value_col=value_col,
        threshold=threshold,
        bucket_width=bucket_width,
    ).collect()[0]
    spark = batch_df.sparkSession
    # A NON-empty batch whose value_col is entirely NULL has zero
    # histogram mass (n_rows=0, ks_stat6=NULL) — exactly the
    # upstream-schema-break drift this monitor exists to catch, so it
    # must surface as an explicit all_null alarm row, never a
    # float(None) crash that kills the streaming query.
    all_null = int(row.n_rows) == 0
    out = spark.createDataFrame(
        [(
            int(batch_id),
            int(row.n_rows),
            None if all_null else float(row.ks_stat6),
            bool(row.drifted),
            all_null,
        )],
        "batch_id long, n_rows long, ks_stat6 double, drifted boolean, "
        "all_null boolean",
    )
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"batch_id={batch_id}")
    )


def stream_drift_monitor(
    docs_stream: DataFrame,
    *,
    ref_hist: DataFrame,
    stats_dir: str,
    checkpoint_dir: str,
    value_col: str = "n_chars",
    threshold: float = 0.2,
    bucket_width: float | None = None,
):
    """Wire the monitor onto a document stream: one KS row per
    micro-batch under ``stats_dir``."""
    ref = ref_hist.localCheckpoint(eager=False)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        process_drift_batch(
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
