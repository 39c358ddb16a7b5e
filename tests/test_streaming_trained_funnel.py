"""Streaming trained funnel (streaming/trained_funnel.py): the deploy
story for corpus_prep_funnel_v4 — per-doc gates + the COMMITTED trained
classifier + exact dedup vs the standing index, asserted stream==batch
over the shared per-doc chain."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_weather_spark.functions.text import doc_fingerprint
from etl_weather_spark.sources.snapshots import snapshot_read
from etl_weather_spark.streaming.classifier_scorer import pin_trained_weights
from etl_weather_spark.streaming.trained_funnel import (
    STAGES,
    process_trained_funnel_batch,
    stream_trained_funnel,
)


@pytest.fixture(scope="module")
def weights(spark, sf_dir):
    # pinned from the COMMITTED model registry — the deploy-time read
    return pin_trained_weights(spark, sf_dir)


def _batch_survivors(spark, docs, weights):
    """The batch-side reference: the same per-doc gate chain + keep-min
    exact dedup, computed over the WHOLE corpus at once."""
    from etl_weather_spark.queries import (
        _code_detect_core,
        _gopher_tuned_core,
        _lang_id_confidence_core,
    )
    from etl_weather_spark.streaming.classifier_scorer import score_docs_batch

    s = docs.join(
        _lang_id_confidence_core(docs)
        .filter(F.col("tier") == "high")
        .select("doc_id"),
        "doc_id",
    )
    s = s.join(
        _code_detect_core(s).filter(~F.col("looks_like_code")).select("doc_id"),
        "doc_id",
    )
    s = s.join(_gopher_tuned_core(s).filter(F.col("keep")).select("doc_id"), "doc_id")
    s = s.join(
        score_docs_batch(s, weights).filter(F.col("keep")).select("doc_id"),
        "doc_id",
    )
    fp = s.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return {r.doc_id for r in keep.collect()}


def test_stream_equals_batch_funnel(spark, sf_dir, tmp_path, weights):
    """Feed the corpus as id-ordered micro-batches; the accepted
    snapshot table must equal the batch chain's survivor set exactly
    (first-arrival == keep-min under id-ordered feeding)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
    rows = docs.collect()
    src = tmp_path / "src"
    src.mkdir()
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        (src / f"b{i}.json").write_text(
            "\n".join(json.dumps(r.asDict()) for r in chunk)
        )

    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    feed = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sq = stream_trained_funnel(
        feed,
        accepted_table=accepted,
        stats_dir=stats,
        checkpoint_dir=str(tmp_path / "ckpt"),
        weights=weights,
    )
    sq.awaitTermination(300)

    got = {r.doc_id for r in snapshot_read(spark, accepted).select("doc_id").collect()}
    want = _batch_survivors(spark, docs, weights)
    assert got == want
    assert len(got) > 0

    # stage counts: monotone non-increasing per batch, totals add up
    st = spark.read.parquet(stats).collect()
    assert len(st) == 3
    for r in st:
        seq = [r[f"n_{s}"] for s in STAGES]
        assert all(a >= b for a, b in zip(seq, seq[1:], strict=False))
    assert sum(r.n_new_unique for r in st) == len(got)


def test_replay_is_noop(spark, sf_dir, tmp_path, weights):
    """At-least-once replay: re-running a committed batch id neither
    duplicates snapshot rows nor changes the stats bytes."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .limit(100)
    )
    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    process_trained_funnel_batch(
        docs, 0, accepted_table=accepted, stats_dir=stats, weights=weights
    )
    before = sorted(
        r.doc_id for r in snapshot_read(spark, accepted).select("doc_id").collect()
    )
    process_trained_funnel_batch(
        docs, 0, accepted_table=accepted, stats_dir=stats, weights=weights
    )
    after = sorted(
        r.doc_id for r in snapshot_read(spark, accepted).select("doc_id").collect()
    )
    assert before == after


def test_cross_batch_dedup_first_arrival(spark, sf_dir, tmp_path, weights):
    """A doc whose fingerprint already sits in the accepted table is
    rejected in a later batch (standing-index anti join). Uses a REAL
    corpus doc that survives every gate, re-fed under a new id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    survivor_ids = _batch_survivors(spark, docs, weights)
    keeper = docs.filter(
        F.col("doc_id") == min(survivor_ids)
    ).collect()[0]

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame(
        [(keeper.doc_id, keeper.text, keeper.lang, keeper.source, keeper.n_chars)],
        schema,
    )
    # same text, new id, later batch -> must be rejected by the index
    b1 = spark.createDataFrame(
        [(keeper.doc_id + 10**9, keeper.text, keeper.lang, keeper.source,
          keeper.n_chars)],
        schema,
    )
    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    for bid, b in ((0, b0), (1, b1)):
        process_trained_funnel_batch(
            b, bid, accepted_table=accepted, stats_dir=stats, weights=weights
        )
    got = sorted(
        r.doc_id for r in snapshot_read(spark, accepted).select("doc_id").collect()
    )
    assert got == [keeper.doc_id]  # first arrival kept, replayed text rejected


def test_crash_between_append_and_stats_heals_on_replay(
    spark, sf_dir, tmp_path, weights
):
    """Exactly-once under the worst crash window (ADVICE r9): the
    snapshot append committed but the stats write was lost. The replay
    marker guards ONLY the append, so replaying the batch id must (a)
    not duplicate snapshot rows and (b) rewrite stats/batch_id=N with
    IDENTICAL bytes — the survivor count recomputed against the
    pre-append standing state via snapshot time travel."""
    import shutil

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .limit(100)
    )
    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    process_trained_funnel_batch(
        docs, 0, accepted_table=accepted, stats_dir=stats, weights=weights
    )
    first_stats = sorted(
        tuple(r) for r in spark.read.parquet(f"{stats}/batch_id=0").collect()
    )
    rows_before = sorted(
        r.doc_id for r in snapshot_read(spark, accepted).select("doc_id").collect()
    )
    assert first_stats[0][-1] == len(rows_before) > 0

    shutil.rmtree(stats)  # the crash: append committed, stats lost
    process_trained_funnel_batch(
        docs, 0, accepted_table=accepted, stats_dir=stats, weights=weights
    )
    healed_stats = sorted(
        tuple(r) for r in spark.read.parquet(f"{stats}/batch_id=0").collect()
    )
    rows_after = sorted(
        r.doc_id for r in snapshot_read(spark, accepted).select("doc_id").collect()
    )
    assert healed_stats == first_stats  # identical bytes, incl. survivors
    assert rows_after == rows_before  # append stayed a no-op


def _doc_frame(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def test_incremental_query_matches_snapshot_path(
    spark, sf_dir, tmp_path, weights
):
    """The oracled corpus_prep_funnel_incremental (standing = even half,
    delta = odd half, derived in-plan) must agree stage-for-stage with
    the REAL snapshot path: feed the even half as batch 0, the odd half
    as batch 1, and the batch-1 stats row IS the delta report."""
    from etl_weather_spark.queries import corpus_prep_funnel_incremental

    docs = _doc_frame(spark, sf_dir)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    for bid, b in ((0, even), (1, odd)):
        process_trained_funnel_batch(
            b, bid, accepted_table=accepted, stats_dir=stats, weights=weights
        )
    batch1 = spark.read.parquet(f"{stats}/batch_id=1").collect()[0]
    q = corpus_prep_funnel_incremental(spark, sf_dir).orderBy("stage").collect()
    assert [r.stage_name for r in q] == list(STAGES)
    assert [r.n_kept for r in q] == [batch1[f"n_{s}"] for s in STAGES]
    assert q[0].n_kept > q[-1].n_kept > 0  # the funnel actually funnels


def test_delta_then_merge_equals_full_recompute(
    spark, sf_dir, tmp_path, weights
):
    """Incremental processing (standing half, then delta) must accept
    exactly the full-recompute survivor set at the FINGERPRINT level
    (doc_id choice differs by first-arrival vs global keep-min — the
    documented contract)."""
    docs = _doc_frame(spark, sf_dir)
    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    for bid, b in (
        (0, docs.filter(F.col("doc_id") % 2 == 0)),
        (1, docs.filter(F.col("doc_id") % 2 == 1)),
    ):
        process_trained_funnel_batch(
            b, bid, accepted_table=accepted, stats_dir=stats, weights=weights
        )
    merged = {
        r.fingerprint
        for r in snapshot_read(spark, accepted).select("fingerprint").collect()
    }
    full_ids = _batch_survivors(spark, docs, weights)
    full = {
        r.fp
        for r in docs.filter(F.col("doc_id").isin(list(full_ids)))
        .select(doc_fingerprint(F.col("text")).alias("fp"))
        .collect()
    }
    assert merged == full and len(merged) > 0


def test_funnel_delta_report_matches_batch_stats(
    spark, sf_dir, tmp_path, weights
):
    """funnel_delta_report (lazy, no writes) returns the same six
    numbers the write path records in its stats row."""
    from etl_weather_spark.streaming.trained_funnel import funnel_delta_report

    docs = _doc_frame(spark, sf_dir)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    accepted = str(tmp_path / "accepted")
    stats = str(tmp_path / "stats")
    process_trained_funnel_batch(
        even, 0, accepted_table=accepted, stats_dir=stats, weights=weights
    )
    report = funnel_delta_report(
        odd, accepted_table=accepted, weights=weights
    ).collect()
    process_trained_funnel_batch(
        odd, 1, accepted_table=accepted, stats_dir=stats, weights=weights
    )
    batch1 = spark.read.parquet(f"{stats}/batch_id=1").collect()[0]
    assert [r.n_kept for r in report] == [batch1[f"n_{s}"] for s in STAGES]
    assert [r.stage_name for r in report] == list(STAGES)
