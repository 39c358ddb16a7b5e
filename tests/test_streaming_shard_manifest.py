"""Streaming shard-manifest maintenance: the folded incremental
manifest equals the REGISTERED batch query's answer on the union of
batches (stream==batch, the house parity discipline), replays rewrite
identical partials, and empty batches are skipped."""

from __future__ import annotations

import json

from etl_weather_spark import queries as q
from etl_weather_spark.streaming.shard_manifest import (
    process_manifest_batch,
    read_shard_manifest,
    stream_shard_manifest,
)


def _doc_rows(lo, hi):
    return [
        {"doc_id": i, "text": f"doc {i} body", "lang": "en",
         "source": f"s{i % 3}", "n_chars": 10 + i % 7}
        for i in range(lo, hi)
    ]


def test_stream_manifest_equals_batch_query(spark, tmp_path):
    """Two micro-batches folded == shard_assignment_stats on the union
    (n_docs and id_checksum columns — the additive core)."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(json.dumps(r) for r in _doc_rows(0, 400))
    )
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in _doc_rows(400, 1000))
    )
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    manifest = str(tmp_path / "manifest")
    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    sq = stream_shard_manifest(
        feed, manifest_dir=manifest, checkpoint_dir=str(tmp_path / "ckpt")
    )
    sq.awaitTermination(180)

    got = {
        r.shard_id: (r.n_docs, r.id_checksum)
        for r in read_shard_manifest(spark, manifest).collect()
    }
    # batch twin: the registered query over the SAME docs as one table
    union = spark.read.json(
        [str(src / "b0.json"), str(src / "b1.json")], schema=schema
    )
    d = str(tmp_path / "batch")
    union.coalesce(1).write.parquet(f"{d}/documents.parquet")
    want = {
        r.shard_id: (r.n_docs, r.id_checksum)
        for r in q.shard_assignment_stats(spark, d).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == 1000


def test_replay_rewrites_identical_partial(spark, tmp_path):
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
         for r in _doc_rows(0, 200)],
        schema,
    )
    manifest = str(tmp_path / "manifest")
    process_manifest_batch(batch, 5, manifest_dir=manifest)
    before = sorted(
        tuple(r) for r in spark.read.parquet(manifest).collect()
    )
    # at-least-once replay of the same batch id (repartitioned — the
    # content-addressed assignment must not care)
    process_manifest_batch(batch.repartition(7), 5, manifest_dir=manifest)
    after = sorted(tuple(r) for r in spark.read.parquet(manifest).collect())
    assert after == before


def test_empty_batch_writes_nothing(spark, tmp_path):
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    empty = spark.createDataFrame([], schema)
    manifest = tmp_path / "manifest"
    process_manifest_batch(empty, 3, manifest_dir=str(manifest))
    assert not manifest.exists()
