"""Slowly-changing-dimension (SCD Type 2) operators.

Turns an event/change stream into effective-dated dimension history:
one row per (key, consecutive-run-of-equal-attributes) with
``valid_from`` / ``valid_to`` / ``is_current`` — the standard
warehouse pattern for tracking attribute history (Kimball SCD2), and
the batch core of a CDC pipeline's apply step.

Reference parity: the reference engine has no SCD support; this is one
of the beyond-reference lakehouse operators (SURVEY.md §2 extension
set) alongside snapshots/time-travel (sources/snapshots.py).

Scale design: the whole collapse is ONE shuffle. Both window passes
and the segment aggregation cluster on the dimension key — Spark's
EnsureRequirements recognizes that hash-partitioning on ``key_col``
satisfies the clustered distribution of every downstream step
(groupBy(key, version) needs only co-location of equal keys), so the
plan carries a single Exchange regardless of input size
(asserted in tests/test_plans.py). State per key is bounded by that
key's history length, never the table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an ordered change stream into SCD2 effective-dated rows.

    Consecutive rows of a key with identical ``attr_cols`` form one
    version (gaps-and-islands): ``changed = any(attr != lag(attr))``
    marks island starts, a running sum numbers them, and a group-by
    per (key, version) collapses each island to its first timestamp.
    ``valid_to`` is the NEXT version's ``valid_from`` (half-open
    intervals, the lakehouse convention: as-of lookups use
    ``valid_from <= t AND (t < valid_to OR valid_to IS NULL)``);
    the latest version has ``valid_to`` null and ``is_current`` true.

    ``tiebreak_cols`` makes ordering total when ``ts_col`` can tie
    (always pass the event's unique id if timestamps are not unique —
    a nondeterministic order under ties would make version boundaries
    run-dependent).

    Columns out: key, version (1-based), attrs..., valid_from,
    valid_to, is_current, n_rows (events collapsed into the version).
    """
    tiebreak = list(tiebreak_cols or [])
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)

    changed: Column = F.lit(False)
    for c in attr_cols:
        # null-safe: a null attr following a non-null (or vice versa)
        # is a change; two nulls are not
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # row_number guard (not lag(ts) IS NULL) so a null timestamp can't
    # merge the key's first island into a phantom predecessor
    is_start = (F.row_number().over(w) == 1) | changed

    versioned = df.select(
        key_col, ts_col, *tiebreak, *attr_cols,
        F.sum(is_start.cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("version"),
    )

    segments = versioned.groupBy(key_col, "version", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return segments.select(
        key_col,
        "version",
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_rows",
    )


def scd2_lookup_asof(
    history: DataFrame,
    keys_at: DataFrame,
    *,
    key_col: str,
    at_col: str,
) -> DataFrame:
    """Resolve (key, timestamp) probes against SCD2 history: the version
    effective at each probe time (half-open interval match).

    Scale: an equi-join on the key plus a non-equi interval predicate —
    Spark executes it as a hash/sort-merge join on ``key_col`` with the
    range condition as a post-join filter, so cost is driven by per-key
    version counts (bounded history), never a cross product.
    """
    h = history.alias("h")
    p = keys_at.alias("p")
    at = F.col(f"p.{at_col}")
    return p.join(
        h,
        on=(
            (F.col(f"p.{key_col}") == F.col(f"h.{key_col}"))
            & (F.col("h.valid_from") <= at)
            & (at < F.coalesce(F.col("h.valid_to"), F.lit("9999-12-31").cast("timestamp")))
        ),
        how="left",
    ).drop(F.col(f"h.{key_col}"))
