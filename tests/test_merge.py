"""operators/merge (MERGE semantics, CDC diff) + snapshot wrappers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_weather_spark.operators.merge import diff_frames, merge_frames
from etl_weather_spark.sources.snapshots import (
    snapshot_changes,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_merge_update_insert_keep(spark):
    target = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    source = _df(spark, [(2, "B"), (4, "D")])
    out = merge_frames(target, source, ["k"])
    assert _rows(out) == [(1, "a"), (2, "B"), (3, "c"), (4, "D")]


def test_merge_delete_condition_on_source(spark):
    target = _df(spark, [(1, "a"), (2, "b")])
    source = _df(spark, [(1, "DEL"), (2, "B2"), (9, "DEL")])
    out = merge_frames(
        target, source, ["k"], delete_condition=F.col("s.v") == "DEL"
    )
    # matched DEL row deletes; unmatched DEL row is a no-op (no insert)
    assert _rows(out) == [(2, "B2")]


def test_merge_null_key_inserts_not_matches(spark):
    target = spark.createDataFrame([(None, "t")], "k long, v string")
    source = spark.createDataFrame([(None, "s")], "k long, v string")
    out = merge_frames(target, source, ["k"])
    assert sorted(_rows(out)) == [(None, "s"), (None, "t")]


def test_merge_requires_target_columns(spark):
    target = _df(spark, [(1, "a")])
    source = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="missing merge columns"):
        merge_frames(target, source, ["k"])


def test_merge_source_extra_columns_dropped(spark):
    target = _df(spark, [(1, "a")])
    source = spark.createDataFrame([(1, "A", 99)], ["k", "v", "extra"])
    out = merge_frames(target, source, ["k"])
    assert out.columns == ["k", "v"] and _rows(out) == [(1, "A")]


def test_diff_emits_only_changes(spark):
    old = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = _df(spark, [(1, "a"), (2, "B"), (4, "d")])
    got = sorted(
        (r["k"], r["change_type"], r["v"]) for r in diff_frames(old, new, ["k"]).collect()
    )
    assert got == [(2, "update", "B"), (3, "delete", "c"), (4, "insert", "d")]


def test_diff_null_value_equality_is_null_safe(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert diff_frames(old, new, ["k"]).count() == 0


def test_snapshot_merge_commits_new_version_and_changes_feed(spark, tmp_path):
    table = str(tmp_path / "tbl")
    v0 = snapshot_write(_df(spark, [(1, "a"), (2, "b")]), table)
    src = _df(spark, [(2, "B"), (3, "c")])
    v1 = snapshot_merge(spark, table, src, ["k"])
    assert (v0, v1) == (0, 1)
    assert _rows(snapshot_read(spark, table)) == [(1, "a"), (2, "B"), (3, "c")]
    # time travel still sees the pre-merge content
    assert _rows(snapshot_read(spark, table, version=v0)) == [(1, "a"), (2, "b")]
    cdc = sorted(
        (r["k"], r["change_type"], r["v"])
        for r in snapshot_changes(spark, table, ["k"], from_version=v0).collect()
    )
    assert cdc == [(2, "update", "B"), (3, "insert", "c")]


def test_snapshot_merge_delete_shows_in_changes(spark, tmp_path):
    table = str(tmp_path / "tbl")
    v0 = snapshot_write(_df(spark, [(1, "a"), (2, "kill")]), table)
    v1 = snapshot_merge(
        spark,
        table,
        _df(spark, [(2, "kill")]),
        ["k"],
        delete_condition=F.col("s.v") == "kill",
    )
    assert _rows(snapshot_read(spark, table)) == [(1, "a")]
    cdc = [
        (r["k"], r["change_type"])
        for r in snapshot_changes(
            spark, table, ["k"], from_version=v0, to_version=v1
        ).collect()
    ]
    assert cdc == [(2, "delete")]


def test_diff_then_merge_reconstructs_new_table(spark):
    """CDC round trip: applying diff_frames(old, new) to old via
    merge_frames must reproduce new exactly — the invariant that makes
    a change feed a faithful replication stream. Randomized over
    seeded inserts/updates/deletes."""
    import random

    from pyspark.sql import functions as F

    for seed in (5, 23):
        rng = random.Random(seed)
        old_rows = [(k, f"v{rng.randint(0, 9)}") for k in range(40)]
        new_rows = {}
        for k, v in old_rows:
            r = rng.random()
            if r < 0.2:
                continue  # delete
            new_rows[k] = f"u{rng.randint(0, 9)}" if r < 0.5 else v
        for k in range(40, 55):  # inserts
            if rng.random() < 0.5:
                new_rows[k] = f"n{rng.randint(0, 9)}"
        old = _df(spark, old_rows)
        new = _df(spark, sorted(new_rows.items()))

        changes = diff_frames(old, new, ["k"])
        applied = merge_frames(
            old,
            changes.select("k", "v", "change_type"),
            ["k"],
            delete_condition=F.col("s.change_type") == "delete",
        )
        assert _rows(applied) == _rows(new), f"seed {seed}"


def test_forget_keys_physically_after_expiry(spark, tmp_path):
    """Right-to-be-forgotten: a merge-delete removes a key from the
    CURRENT version, but time travel still sees it — the data is only
    physically gone once expire_snapshots drops every manifest that
    references the old files. Asserted at the byte level: after
    expiry, no parquet file under the table contains the forgotten
    value."""
    import glob as g

    from etl_weather_spark.sources.snapshots import expire_snapshots

    table = str(tmp_path / "tbl")
    secret = "SECRET-PAYLOAD-424242"
    snapshot_write(_df(spark, [(1, "a"), (2, secret)]), table)
    snapshot_merge(
        spark,
        table,
        _df(spark, [(2, secret)]),
        ["k"],
        delete_condition=F.lit(True),
    )
    # logically gone, physically still present (old version readable)
    assert _rows(snapshot_read(spark, table)) == [(1, "a")]
    assert _rows(snapshot_read(spark, table, version=0)) == [(1, "a"), (2, secret)]

    expired = expire_snapshots(table, keep_last=1)
    assert expired == [0]
    files = g.glob(f"{table}/**/*.parquet", recursive=True)
    assert files
    blob = b"".join(open(f, "rb").read() for f in files)
    assert secret.encode() not in blob  # bytes are actually gone
