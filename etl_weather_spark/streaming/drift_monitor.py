"""Streaming distribution-drift monitor: per-micro-batch two-sample
Kolmogorov–Smirnov statistic against a REFERENCE histogram — the
continuous form of ``queries.ks_drift_audit``, run at the ingestion
edge so a crawler or upstream format change is caught the batch it
lands, not at the next nightly audit.

Design: the reference distribution is captured ONCE as a quantized
(value, count) histogram (a tiny relation — bounded by value
cardinality, not rows) and broadcast against each batch's histogram;
D = max_x |F_ref(x) − F_batch(x)| over the union of values, gaps
rounded at 6 dp (the exact algebra of the batch audit, asserted equal
in tests). Each trigger appends one (batch_id, n_rows, ks_stat6,
drifted) row under ``batch_id=N`` with overwrite, so foreachBatch's
at-least-once replays rewrite the same bytes (the stats-row idempotence
contract of streaming/corpus_ingest).

Scale: per trigger the work is one value-keyed partial agg over the
BATCH plus a join against the broadcast reference histogram; the
reference never rescans. State lives in the reference artifact, not
the stream — restarts need no state-store recovery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import rnd

__all__ = ["reference_histogram", "batch_ks_stat", "stream_drift_monitor"]


def reference_histogram(docs: DataFrame, *, value_col: str = "n_chars") -> DataFrame:
    """Quantized (x, c) histogram of the reference corpus — the standing
    artifact the monitor compares every batch against (persist it to
    the lakehouse in production; it is value-cardinality-sized)."""
    return (
        docs.select(F.col(value_col).cast("long").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def batch_ks_stat(
    batch: DataFrame,
    ref_hist: DataFrame,
    *,
    value_col: str = "n_chars",
    threshold: float = 0.2,
) -> DataFrame:
    """One-row (n_rows, ks_stat6, drifted): the exact KS algebra of
    queries.ks_drift_audit with the reference side precomputed.

    The cumulative window runs over the union of DISTINCT values of
    both histograms (never a row sort); missing values on either side
    contribute zero mass at that point, which is exactly the step-CDF
    semantics."""
    bh = (
        batch.select(F.col(value_col).cast("long").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    joined = (
        ref_hist.withColumnRenamed("c", "ca")
        .join(bh, "x", "full_outer")
        .select(
            "x",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    tot = joined.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    cum = joined.crossJoin(F.broadcast(tot)).select(
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        "na",
        "nb",
    )
    gap6 = rnd(
        F.abs(
            F.col("cca") * 1.0 / F.greatest(F.col("na"), F.lit(1))
            - F.col("ccb") * 1.0 / F.greatest(F.col("nb"), F.lit(1))
        ),
        6,
    )
    return (
        cum.select(gap6.alias("gap6"), "nb")
        .agg(
            F.max("nb").cast("long").alias("n_rows"),
            F.max("gap6").alias("ks_stat6"),
            (F.max("gap6") > threshold).alias("drifted"),
        )
    )


def process_drift_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    ref_hist: DataFrame,
    stats_dir: str,
    value_col: str = "n_chars",
    threshold: float = 0.2,
) -> None:
    """foreachBatch body — idempotent: ``batch_id=N`` overwrites with
    identical bytes on replay."""
    if batch_df.isEmpty():
        return
    row = batch_ks_stat(
        batch_df, ref_hist, value_col=value_col, threshold=threshold
    ).collect()[0]
    spark = batch_df.sparkSession
    out = spark.createDataFrame(
        [(int(batch_id), row.n_rows, float(row.ks_stat6), bool(row.drifted))],
        "batch_id long, n_rows long, ks_stat6 double, drifted boolean",
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
        )

    return (
        docs_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
