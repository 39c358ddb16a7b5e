"""Streaming PSI monitor: per-batch statistic equals the batch audit's
algebra, a planted shifted batch alarms where the in-distribution batch
does not, degenerate batches write visible rows instead of crashing,
and foreachBatch replays rewrite identical stats bytes
(streaming/psi_monitor + operators/ks.psi_from_histograms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark.streaming.drift_monitor import reference_histogram
from etl_weather_spark.streaming.psi_monitor import (
    batch_psi_stat,
    process_psi_batch,
    stream_psi_monitor,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


def test_psi_from_histograms_matches_audit_algebra(spark, sf_dir):
    """psi_from_histograms on the src0-vs-rest split (50-char buckets)
    reproduces the registered psi_drift_audit row for src0 exactly —
    same union support, same Laplace smoothing, same 1e9-quantized-ln
    integer sums."""
    from etl_weather_spark import queries as q
    from etl_weather_spark.operators.ks import psi_from_histograms

    docs = q.load(spark, sf_dir, "documents")

    def hist(flt):
        return (
            docs.filter(flt)
            .select(F.expr("CAST(n_chars AS BIGINT) div 50").alias("x"))
            .filter(F.col("x").isNotNull())
            .groupBy("x")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    got = psi_from_histograms(
        hist(F.col("source") == "src0"), hist(F.col("source") != "src0")
    ).collect()[0]
    want = {
        r.source: r for r in q.psi_drift_audit(spark, sf_dir).collect()
    }["src0"]
    assert got.psi6 == want.psi6
    assert got.n_a == want.n_docs


def test_identical_distribution_scores_near_zero(spark):
    """Same rows on both sides: every (p - q) is exactly 0, so PSI is
    exactly 0 regardless of smoothing."""
    rows = [(i, 100 + i % 7) for i in range(200)]
    ref = reference_histogram(_docs(spark, rows))
    got = batch_psi_stat(_docs(spark, rows), ref).collect()[0]
    assert got.psi6 == 0.0 and not got.shifted


def test_stream_flags_the_shifted_batch(spark, tmp_path):
    """Two micro-batches: one drawn from the reference distribution,
    one shifted to disjoint support — only the shifted batch alarms;
    a replayed batch body rewrites byte-identical stats."""
    import json

    ref_rows = [(i, 100 + i % 10) for i in range(300)]
    ref = reference_histogram(_docs(spark, ref_rows))

    src = tmp_path / "src"
    src.mkdir()
    same = [{"doc_id": i, "n_chars": 100 + i % 10} for i in range(50)]
    shifted = [
        {"doc_id": 1000 + i, "n_chars": 5000 + i % 10} for i in range(50)
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in same))
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in shifted))

    stats = str(tmp_path / "stats")
    feed = (
        spark.readStream.schema("doc_id long, n_chars long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = stream_psi_monitor(
        feed,
        ref_hist=ref,
        stats_dir=stats,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    out = {r.batch_id: r for r in spark.read.parquet(stats).collect()}
    assert len(out) == 2
    flags = sorted((r.psi6, r.shifted) for r in out.values())
    # the in-distribution batch sits far under the 0.25 cut; disjoint
    # supports push PSI well past it (every bucket is one-sided)
    assert flags[0][0] < 0.25 and flags[0][1] is False
    assert flags[1][0] > 0.25 and flags[1][1] is True

    # replay idempotence: re-running a batch body rewrites same bytes
    before = {
        r.batch_id: (r.n_rows, r.psi6, r.shifted)
        for r in spark.read.parquet(stats).collect()
    }
    replay_df = spark.read.json(
        str(src / "b1.json"), schema="doc_id long, n_chars long"
    )
    shifted_id = max(out, key=lambda b: out[b].psi6)
    process_psi_batch(replay_df, shifted_id, ref_hist=ref, stats_dir=stats)
    after = {
        r.batch_id: (r.n_rows, r.psi6, r.shifted)
        for r in spark.read.parquet(stats).collect()
    }
    assert after == before


def test_psi_catches_broad_drift_ks_understates(spark):
    """The reason BOTH monitors exist: a broad small reweighting across
    many buckets accumulates in PSI while the max single CDF gap stays
    modest — assert PSI's alarm margin exceeds KS's on such a shift."""
    from etl_weather_spark.streaming.drift_monitor import batch_ks_stat

    # reference: uniform over 20 buckets; batch: alternating 30%/70%
    # reweighting of the same support (no new values, no gap cliff)
    ref_rows = [(i, i % 20) for i in range(2000)]
    batch_rows = [
        (i, i % 20) for i in range(2000) if (i % 20) % 2 == 0
    ] + [
        (100000 + i, (i % 10) * 2 + 1) for i in range(300)
    ]
    ref = reference_histogram(_docs(spark, ref_rows))
    ks = batch_ks_stat(_docs(spark, batch_rows), ref).collect()[0]
    psi = batch_psi_stat(_docs(spark, batch_rows), ref).collect()[0]
    # same batch, same reference: the integrated statistic clears its
    # conventional cut while the max-gap statistic stays under its own
    assert psi.psi6 > 0.25 and psi.shifted
    assert ks.ks_stat6 < 0.2 and not ks.drifted


def test_empty_batch_is_degenerate_not_alarm(spark):
    ref = reference_histogram(_docs(spark, [(i, 100) for i in range(10)]))
    empty = _docs(spark, []).filter(F.lit(False))
    got = batch_psi_stat(empty, ref).collect()[0]
    assert got.n_rows == 0
    assert got.psi6 is None
    assert got.shifted is False


def test_all_null_batch_alarms_instead_of_crashing(spark, tmp_path):
    """A NON-empty all-NULL batch writes an explicit all_null=true row
    (the drift monitor's VERDICT-r6 lesson, designed in here)."""
    ref = reference_histogram(_docs(spark, [(i, 100) for i in range(10)]))
    batch = _docs(spark, [(i, None) for i in range(25)])
    stats = str(tmp_path / "stats")
    process_psi_batch(batch, 7, ref_hist=ref, stats_dir=stats)
    rows = spark.read.parquet(stats).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.batch_id == 7
    assert r.n_rows == 0
    assert r.psi6 is None
    assert r.shifted is False
    assert r.all_null is True


def test_all_null_reference_meets_all_null_batch_no_crash(spark, tmp_path):
    """Empty reference histogram + all-NULL batch: the union join is
    empty, the group-less agg returns an all-NULL row — int(None) must
    not kill the stream."""
    ref = reference_histogram(_docs(spark, [(i, None) for i in range(5)]))
    batch = _docs(spark, [(i, None) for i in range(5)])
    stats = str(tmp_path / "stats")
    process_psi_batch(batch, 2, ref_hist=ref, stats_dir=stats)
    r = spark.read.parquet(stats).collect()[0]
    assert r.n_rows == 0 and r.psi6 is None and r.all_null is True


def test_bucket_width_is_bound_to_the_reference_artifact(spark):
    """The width rides IN the shared histogram artifact (one reference
    feeds both monitors); a mismatching monitor refuses loudly and the
    width-less call adopts the artifact's width."""
    import pytest

    df = _docs(spark, [(i, 1000 + i) for i in range(50)])
    ref = reference_histogram(df, bucket_width=100.0)
    ok = batch_psi_stat(df, ref).collect()[0]
    assert ok.psi6 == 0.0 and ok.shifted is False
    with pytest.raises(ValueError, match="bucket_width"):
        batch_psi_stat(df, ref, bucket_width=500.0).collect()


def test_psi_bucket_width_bounds_high_cardinality(spark):
    """psi_from_histograms(bucket_width=...) re-buckets both sides: a
    per-row-cardinality column stays bounded and identical
    distributions still score 0 through the bucketed path."""
    from etl_weather_spark.operators.ks import _rebucket, psi_from_histograms

    ha = spark.createDataFrame(
        [(float(i) + 0.25, 1) for i in range(2000)], "x double, c long"
    )
    hb = spark.createDataFrame(
        [(float(i) + 5000.25, 1) for i in range(2000)], "x double, c long"
    )
    got = psi_from_histograms(ha, hb, bucket_width=100.0).collect()[0]
    assert got.psi6 > 0.25 and got.shifted is True
    assert got.n_a == 2000 and got.n_b == 2000
    same = psi_from_histograms(ha, ha, bucket_width=100.0).collect()[0]
    assert same.psi6 == 0.0 and same.shifted is False
    assert _rebucket(ha, 100.0).count() == 20
