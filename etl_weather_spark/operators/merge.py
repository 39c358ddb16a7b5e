"""Relational MERGE (upsert/delete by key) and version diff (CDC).

The core of Delta/Iceberg's ``MERGE INTO`` and ``table_changes()``
without the table-format dependency: pure DataFrame algebra here, the
copy-on-write commit protocol in sources/snapshots.py
(:func:`snapshot_merge` / :func:`snapshot_changes`).

Scale notes:
- ``merge_frames`` is one full-outer shuffle join on the merge key. At
  100 TB the win is NOT a smarter join — it is rewriting fewer files:
  pair this with partition-pruned copy-on-write (join source keys to
  the partition column first, rewrite only touched partitions — the
  pattern sources/lakehouse.incremental_refresh already implements) or
  bucketed tables so the merge join is shuffle-free on the target side.
- A small changeset against a huge target should broadcast: pass the
  source through ``F.broadcast`` at the call site; the full-outer join
  degrades to a shuffle join only when both sides are large.
- ``diff_frames`` compares full rows via struct equality — one shuffle
  on the key, no column explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_frames", "diff_frames"]


def merge_frames(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    delete_condition: Column | None = None,
) -> DataFrame:
    """MERGE source INTO target ON keys — returns the merged relation.

    Semantics (one pass, standard SCD-Type-1):
    - key in both:   source row replaces the target row (UPDATE) —
      unless ``delete_condition`` (evaluated on the SOURCE row's
      columns) holds, in which case the row is dropped (DELETE).
    - key only in source: row is added (INSERT) — unless
      ``delete_condition`` holds (a delete for an absent key is a
      no-op, like ``WHEN NOT MATCHED`` having no insert clause match).
    - key only in target: row is kept untouched.

    ``source`` must carry at least the target's columns; extras (e.g.
    a CDC op/sequence column) ride through the join so
    ``delete_condition`` can reference them as ``s.<col>``, but are
    dropped from the output. Null join keys never match (SQL
    semantics): a null-keyed source row inserts, it does not update
    every null-keyed target row.
    """
    cols = target.columns
    missing = [c for c in cols if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing merge columns: {missing}")
    t = target.select(*cols, F.lit(True).alias("_t_exists")).alias("t")
    s = source.withColumn("_s_exists", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in on]
    j = t.join(s, cond, "full_outer")

    from_source = F.col("s._s_exists").isNotNull()
    if delete_condition is not None:
        # evaluate on the source side's columns
        delete = from_source & delete_condition
    else:
        delete = F.lit(False)
    picked = [
        F.when(from_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
    ]
    return j.filter(~delete).select(*picked)


def diff_frames(
    old: DataFrame,
    new: DataFrame,
    on: list[str],
) -> DataFrame:
    """Row-level changes old → new: (keys…, change_type, then the NEW
    row's non-key columns for insert/update, the OLD row's for delete).

    change_type ∈ {'insert', 'delete', 'update'}; unchanged rows (full
    struct equality, null-safe) are not emitted. This is the batch
    analog of a CDC feed / Delta ``table_changes``.
    """
    cols = old.columns
    if set(cols) != set(new.columns):
        raise ValueError("diff_frames requires identical schemas")
    rest = [c for c in cols if c not in on]
    o = old.select(*cols, F.lit(True).alias("_o")).alias("o")
    n = new.select(*cols, F.lit(True).alias("_n")).alias("n")
    cond = [F.col(f"o.{k}") == F.col(f"n.{k}") for k in on]
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o._o").isNotNull()
    in_new = F.col("n._n").isNotNull()
    same = F.struct(*[F.col(f"o.{c}") for c in rest]).eqNullSafe(
        F.struct(*[F.col(f"n.{c}") for c in rest])
    )
    change = (
        F.when(in_old & in_new & same, F.lit(None))
        .when(in_old & in_new, F.lit("update"))
        .when(in_new, F.lit("insert"))
        .otherwise(F.lit("delete"))
    )
    keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in on
    ]
    vals = [
        F.when(in_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
        for c in rest
    ]
    return (
        j.select(*keys, change.alias("change_type"), *vals)
        .filter(F.col("change_type").isNotNull())
    )
