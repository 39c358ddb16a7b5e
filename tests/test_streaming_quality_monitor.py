"""Streaming Gopher-quality monitor: per-batch stats equal the batch
operator's algebra, a planted low-quality batch alarms, degenerate
batches (all-failing, all-NULL text) write rows instead of crashing,
and replays rewrite identical stats (streaming/quality_monitor)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_weather_spark.streaming.quality_monitor import (
    batch_quality_stats,
    process_quality_batch,
    stream_quality_monitor,
)

GOOD = "the cat sat and that dog ran off with one hat " * 6  # 60 words, passes
BAD = "short doc"  # word-count fail


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_stats_match_operator_algebra(spark, sf_dir):
    """The monitor's rollup equals counting keeps in the registered
    gate's own output — one shared gopher_quality_profile."""
    from etl_weather_spark import queries as q
    from etl_weather_spark.operators.textops import gopher_quality_profile

    docs = q.load(spark, sf_dir, "documents")
    got = batch_quality_stats(docs, min_stopwords=1).collect()[0]
    prof = gopher_quality_profile(docs, min_stopwords=1)
    want_keep = prof.filter(F.col("keep")).count()
    want_n = prof.count()
    assert got.n_docs == want_n
    assert got.n_keep == want_keep
    assert got.keep_rate6 == round(want_keep / want_n, 6)


def test_all_failing_batch_alarms_instead_of_crashing(spark, tmp_path):
    """Every doc failing (and a NULL-text doc in the mix) must write
    keep_rate6=0.0 / low_quality=true — the degenerate case designed
    in from the start (the KS monitor's all-NULL lesson)."""
    batch = _docs(spark, [(1, BAD), (2, BAD), (3, None)])
    stats = str(tmp_path / "stats")
    process_quality_batch(batch, 5, stats_dir=stats)
    r = spark.read.parquet(stats).collect()[0]
    assert r.batch_id == 5
    assert r.n_docs == 3 and r.n_keep == 0
    assert r.keep_rate6 == 0.0
    assert r.low_quality is True


def test_empty_batch_skipped(spark, tmp_path):
    import os

    empty = _docs(spark, []).filter(F.lit(False))
    stats = str(tmp_path / "stats")
    process_quality_batch(empty, 0, stats_dir=stats)
    assert not os.path.exists(stats)


def test_stream_flags_the_low_quality_batch(spark, tmp_path):
    """Two micro-batches: one of passing docs, one of failing docs —
    only the bad batch alarms; replaying a batch body rewrites
    identical stats."""
    src = tmp_path / "src"
    src.mkdir()
    good = [{"doc_id": i, "text": GOOD} for i in range(20)]
    bad = [{"doc_id": 100 + i, "text": BAD} for i in range(20)]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in good))
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in bad))

    stats = str(tmp_path / "stats")
    feed = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = stream_quality_monitor(
        feed,
        stats_dir=stats,
        checkpoint_dir=str(tmp_path / "ckpt"),
        min_stopwords=1,
    )
    q.awaitTermination(180)

    out = {r.batch_id: r for r in spark.read.parquet(stats).collect()}
    assert len(out) == 2
    rates = sorted((r.keep_rate6, r.low_quality) for r in out.values())
    assert rates[0] == (0.0, True)
    assert rates[1] == (1.0, False)

    # replay idempotence
    before = {
        r.batch_id: (r.n_docs, r.n_keep, r.keep_rate6, r.low_quality)
        for r in spark.read.parquet(stats).collect()
    }
    bad_id = min(out, key=lambda b: out[b].keep_rate6)
    replay = spark.read.json(
        str(src / "b1.json"), schema="doc_id long, text string"
    )
    process_quality_batch(replay, bad_id, stats_dir=stats, min_stopwords=1)
    after = {
        r.batch_id: (r.n_docs, r.n_keep, r.keep_rate6, r.low_quality)
        for r in spark.read.parquet(stats).collect()
    }
    assert after == before
