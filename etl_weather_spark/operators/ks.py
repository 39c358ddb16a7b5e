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

__all__ = ["ks_from_histograms", "psi_from_histograms"]


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


def psi_from_histograms(
    ha: DataFrame,
    hb: DataFrame,
    *,
    threshold: float = 0.25,
    bucket_width: float | None = None,
) -> DataFrame:
    """One row (psi6, n_a, n_b, shifted) from two (x, c) histograms —
    the Population Stability Index companion to ks_from_histograms
    (KS reacts to the single worst CDF gap; PSI integrates the whole
    shift — the model-risk convention: <0.1 stable, 0.1–0.25
    moderate, >0.25 shifted, the default threshold).

    PSI = Σ_buckets (p−q)·ln(p/q) over the union of supports, with
    Laplace smoothing (c+1)/(n+B), B = |union support|, so empty
    buckets stay finite on both sides. The term is symmetric under
    side swap, so orientation doesn't matter. Exactly the algebra of
    queries.psi_drift_audit (asserted equal in tests): proportions
    are exact rationals, each ln is 1e9-quantized, each term
    1e9-quantized into an exact-integer sum, PSI rounds at 6 dp —
    cross-engine and partition-order deterministic.

    ``bucket_width`` re-buckets both sides to floor(x/width) first
    (the same BY-CONSTRUCTION boundedness contract as
    ks_from_histograms). Degenerate inputs: an empty side still
    yields a finite PSI against the smoothed floor; two empty sides
    yield one all-NULL row (group-less agg) — callers surface that
    (the streaming monitor writes an all_null alarm row).
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
    dims = joined.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("b"),
    )
    g = joined.crossJoin(F.broadcast(dims))
    p = (F.col("ca") + F.lit(1.0)) / (F.col("na") + F.col("b"))
    q = (F.col("cb") + F.lit(1.0)) / (F.col("nb") + F.col("b"))
    term = (p - q) * rnd(F.log(p / q), 9)
    psi6 = rnd(
        F.sum(F.floor(term * F.lit(1000000000) + F.lit(0.5)).cast("long")).cast(
            "double"
        )
        / F.lit(1000000000),
        6,
    )
    return g.agg(
        psi6.alias("psi6"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        (psi6 > threshold).alias("shifted"),
    )
