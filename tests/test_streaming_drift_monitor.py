"""Streaming KS drift monitor: per-batch statistic equals the batch
audit's algebra, a planted drifted batch alarms, and foreachBatch
replays rewrite identical stats bytes (streaming/drift_monitor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark.streaming.drift_monitor import (
    batch_ks_stat,
    process_drift_batch,
    reference_histogram,
    stream_drift_monitor,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_batch_ks_matches_audit_algebra(spark, sf_dir):
    """batch_ks_stat on the src0-vs-rest split reproduces
    queries.ks_drift_audit exactly (same quantized-histogram algebra)."""
    from etl_weather_spark import queries as q

    docs = q.load(spark, sf_dir, "documents")
    ref = reference_histogram(docs.filter(F.col("source") == "src0"))
    batch = docs.filter(F.col("source") != "src0")
    got = batch_ks_stat(batch, ref).collect()[0]
    want = q.ks_drift_audit(spark, sf_dir).collect()[0]
    assert got.ks_stat6 == want.ks_stat6
    assert got.drifted == want.drifted
    assert got.n_rows == want.n_b


def test_identical_distribution_scores_zero(spark):
    rows = [(i, 100 + i % 7) for i in range(200)]
    ref = reference_histogram(_docs(spark, rows))
    got = batch_ks_stat(_docs(spark, rows), ref).collect()[0]
    assert got.ks_stat6 == 0.0 and not got.drifted


def test_stream_flags_the_drifted_batch(spark, tmp_path):
    """Two micro-batches: one drawn from the reference distribution,
    one shifted far right — only the shifted batch alarms; a replayed
    run rewrites byte-identical stats."""
    import json

    ref_rows = [(i, 100 + i % 10) for i in range(300)]
    ref = reference_histogram(_docs(spark, ref_rows))

    src = tmp_path / "src"
    src.mkdir()
    same = [{"doc_id": i, "n_chars": 100 + i % 10} for i in range(50)]
    shifted = [{"doc_id": 1000 + i, "n_chars": 5000 + i % 10} for i in range(50)]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in same))
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in shifted))

    stats = str(tmp_path / "stats")
    feed = (
        spark.readStream.schema("doc_id long, n_chars long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = stream_drift_monitor(
        feed,
        ref_hist=ref,
        stats_dir=stats,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    out = {r.batch_id: r for r in spark.read.parquet(stats).collect()}
    assert len(out) == 2
    flags = sorted((r.ks_stat6, r.drifted) for r in out.values())
    # the in-distribution batch sits under the 0.2 cut; the shifted
    # batch's CDF gap is ~1.0 (disjoint supports)
    assert flags[0][0] < 0.2 and flags[0][1] is False
    assert flags[1][0] > 0.9 and flags[1][1] is True

    # replay idempotence: re-running a batch body rewrites same bytes
    before = {r.batch_id: (r.n_rows, r.ks_stat6, r.drifted) for r in spark.read.parquet(stats).collect()}
    replay_df = spark.read.json(str(src / "b1.json"), schema="doc_id long, n_chars long")
    drifted_id = max(out, key=lambda b: out[b].ks_stat6)
    process_drift_batch(replay_df, drifted_id, ref_hist=ref, stats_dir=stats)
    after = {r.batch_id: (r.n_rows, r.ks_stat6, r.drifted) for r in spark.read.parquet(stats).collect()}
    assert after == before


def test_empty_batch_is_degenerate_not_alarm(spark):
    """An empty batch must surface as n_rows=0 / NULL statistic /
    drifted=false — never a false alarm (review finding: the guarded
    division used to read an empty CDF as a 1.0 gap)."""
    ref = reference_histogram(_docs(spark, [(i, 100) for i in range(10)]))
    empty = _docs(spark, []).filter(F.lit(False))
    got = batch_ks_stat(empty, ref).collect()[0]
    assert got.n_rows == 0
    assert got.ks_stat6 is None
    assert got.drifted is False


def test_null_values_carry_no_mass(spark):
    """NULL n_chars rows are dropped from both histograms: identical
    distributions with NULLs sprinkled in still score 0.0 (a NULL-keyed
    full-outer join would split the NULL mass and false-alarm)."""
    rows = [(i, 100 + i % 5) for i in range(100)] + [(900 + i, None) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    ref = reference_histogram(df)
    got = batch_ks_stat(df, ref).collect()[0]
    assert got.ks_stat6 == 0.0 and not got.drifted
    assert got.n_rows == 100  # null rows carry no histogram mass


def test_all_null_batch_alarms_instead_of_crashing(spark, tmp_path):
    """A NON-empty batch whose value_col is entirely NULL (an upstream
    schema break — exactly the drift this monitor exists to catch) must
    write an explicit all_null=true row, not die on float(None)
    (VERDICT r6 #2)."""
    ref = reference_histogram(_docs(spark, [(i, 100) for i in range(10)]))
    batch = _docs(spark, [(i, None) for i in range(25)])
    stats = str(tmp_path / "stats")
    process_drift_batch(batch, 7, ref_hist=ref, stats_dir=stats)
    rows = spark.read.parquet(stats).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.batch_id == 7
    assert r.n_rows == 0
    assert r.ks_stat6 is None
    assert r.drifted is False
    assert r.all_null is True


def test_normal_batch_writes_all_null_false(spark, tmp_path):
    ref = reference_histogram(_docs(spark, [(i, 100 + i % 5) for i in range(50)]))
    batch = _docs(spark, [(i, 100 + i % 5) for i in range(20)])
    stats = str(tmp_path / "stats")
    process_drift_batch(batch, 3, ref_hist=ref, stats_dir=stats)
    r = spark.read.parquet(stats).collect()[0]
    assert r.all_null is False and r.n_rows == 20 and r.ks_stat6 == 0.0


def test_bucket_width_bounds_high_cardinality_doubles(spark):
    """ks_from_histograms(bucket_width=...) re-buckets BOTH histograms
    so a near-per-row-cardinality value column (e.g. raw doubles cast
    long, or nanosecond timestamps) cannot produce an unbounded
    distinct-value relation under the global cumulative window
    (VERDICT r6 #7)."""
    from etl_weather_spark.operators.ks import ks_from_histograms

    # every value distinct: histogram cardinality == row count
    ha = spark.createDataFrame(
        [(float(i) + 0.25, 1) for i in range(2000)], "x double, c long"
    )
    hb = spark.createDataFrame(
        [(float(i) + 5000.25, 1) for i in range(2000)], "x double, c long"
    )
    got = ks_from_histograms(ha, hb, bucket_width=100.0).collect()[0]
    # disjoint supports -> KS = 1.0 regardless of bucketing
    assert got.ks_stat6 == 1.0 and got.drifted is True
    assert got.n_a == 2000 and got.n_b == 2000
    # identical distributions stay 0 after bucketing
    same = ks_from_histograms(ha, ha, bucket_width=100.0).collect()[0]
    assert same.ks_stat6 == 0.0 and same.drifted is False
    # bucketed relation is bounded: 2000 distinct values -> <= 21 buckets
    from etl_weather_spark.operators.ks import _rebucket

    assert _rebucket(ha, 100.0).count() == 20


def test_monitor_bucket_width_end_to_end(spark):
    """bucket_width threads through reference_histogram and
    batch_ks_stat: a near-per-row-cardinality double column stays
    bounded on BOTH sides and identical distributions still score 0."""
    rows = [(i, 1_000_000 + i * 7) for i in range(500)]  # 500 distinct values
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    ref = reference_histogram(df, bucket_width=500.0)
    assert ref.count() <= 8  # 3500-wide range / 500 per bucket
    got = batch_ks_stat(df, ref, bucket_width=500.0).collect()[0]
    assert got.ks_stat6 == 0.0 and got.drifted is False
    # a shifted batch still alarms through the bucketed path
    shifted = spark.createDataFrame(
        [(i, 9_000_000 + i * 7) for i in range(500)], "doc_id long, n_chars long"
    )
    bad = batch_ks_stat(shifted, ref, bucket_width=500.0).collect()[0]
    assert bad.ks_stat6 == 1.0 and bad.drifted is True


def test_all_null_reference_meets_all_null_batch_no_crash(spark, tmp_path):
    """Round-7 review: an all-NULL reference corpus yields an EMPTY
    reference histogram; an all-NULL batch then makes the KS join
    empty and n_rows comes back NULL (not 0) — int(None) must not
    kill the stream."""
    ref = reference_histogram(_docs(spark, [(i, None) for i in range(5)]))
    batch = _docs(spark, [(i, None) for i in range(5)])
    stats = str(tmp_path / "stats")
    process_drift_batch(batch, 2, ref_hist=ref, stats_dir=stats)
    r = spark.read.parquet(stats).collect()[0]
    assert r.n_rows == 0 and r.ks_stat6 is None and r.all_null is True


def test_bucket_width_is_bound_to_the_reference_artifact(spark):
    """Round-7 review: the width rides IN the histogram artifact; a
    monitor configured with a different width must refuse instead of
    silently comparing raw values against bucket ids."""
    import pytest

    df = _docs(spark, [(i, 1000 + i) for i in range(50)])
    ref = reference_histogram(df, bucket_width=100.0)
    assert "bucket_width" in ref.columns
    # adopted automatically when the monitor passes no width
    ok = batch_ks_stat(df, ref).collect()[0]
    assert ok.ks_stat6 == 0.0 and ok.drifted is False
    # explicit mismatch refuses loudly
    with pytest.raises(ValueError, match="bucket_width"):
        batch_ks_stat(df, ref, bucket_width=500.0).collect()


def test_read_drift_stats_merges_pre_upgrade_schema(spark, tmp_path):
    """Round-7 review: pre-upgrade batch partitions lack all_null; the
    reader must union schemas and surface old rows as all_null=false."""
    from etl_weather_spark.streaming.drift_monitor import read_drift_stats

    stats = tmp_path / "stats"
    # old-schema partition (pre-round-7: four columns)
    spark.createDataFrame(
        [(0, 10, 0.05, False)],
        "batch_id long, n_rows long, ks_stat6 double, drifted boolean",
    ).coalesce(1).write.parquet(str(stats / "batch_id=0"))
    # new-schema partition via the current writer
    ref = reference_histogram(_docs(spark, [(i, 100) for i in range(10)]))
    process_drift_batch(
        _docs(spark, [(i, 100) for i in range(10)]), 1,
        ref_hist=ref, stats_dir=str(stats),
    )
    out = {r.batch_id: r for r in read_drift_stats(spark, str(stats)).collect()}
    assert out[0].all_null is False  # old row, column backfilled
    assert out[1].all_null is False and out[1].ks_stat6 == 0.0
