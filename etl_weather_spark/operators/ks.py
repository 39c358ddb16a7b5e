"""Two-sample Kolmogorov–Smirnov from quantized histograms — the ONE
implementation shared by the batch audit (queries.ks_drift_audit) and
the streaming monitor (streaming/drift_monitor), so the cross-engine-
deterministic CDF algebra cannot drift between them.

D = max_x |F_a(x) − F_b(x)| over the union of distinct values, with
each gap rounded at 6 dp BEFORE the max (both engines then agree
exactly). The cumulative window runs over the distinct-VALUE relation
— bounded by value cardinality, never a per-row sort — which is what
makes an exact KS statistic tractable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import rnd

__all__ = ["ks_from_histograms"]


def _rebucket(h: DataFrame, width: float) -> DataFrame:
    """Collapse an (x, c) histogram onto floor(x/width) bucket ids —
    a value-keyed partial agg, output bounded by range/width."""
    return (
        h.select(
            F.floor(F.col("x") / F.lit(float(width))).cast("long").alias("x"),
            "c",
        )
        .groupBy("x")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def ks_from_histograms(
    ha: DataFrame,
    hb: DataFrame,
    *,
    threshold: float = 0.2,
    bucket_width: float | None = None,
) -> DataFrame:
    """One row (ks_stat6, n_a, n_b, drifted) from two (x, c) histograms.

    Missing values on either side contribute zero mass at that point
    (full-outer union of supports — the step-CDF semantics). Division
    guards ``greatest(n, 1)`` keep an empty side finite; callers decide
    how to present the degenerate case (the streaming monitor nulls the
    statistic when the batch is empty).

    ``bucket_width`` bounds the distinct-value relation BY CONSTRUCTION:
    both histograms are re-bucketed to ``floor(x / width)`` before the
    union join, so the global cumulative window runs over at most
    range/width rows no matter how wide-ranging or floating-point the
    value column was. The bucket id is a monotone transform of x, so
    the statistic is the KS of the bucketed distributions (exact when
    every raw value maps to its own bucket; a deterministic
    quantization otherwise). With the default ``None`` the caller's
    quantization is trusted — the documented contract that histogram
    cardinality stays bounded.
    """
    if bucket_width is not None:
        ha = _rebucket(ha, bucket_width)
        hb = _rebucket(hb, bucket_width)
    joined = (
        ha.select("x", F.col("c").alias("ca"))
        .join(hb.select("x", F.col("c").alias("cb")), "x", "full_outer")
        .select(
            "x",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    tot = joined.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
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
    return cum.select(gap6.alias("gap6"), "na", "nb").agg(
        F.max("gap6").alias("ks_stat6"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        (F.max("gap6") > threshold).alias("drifted"),
    )
