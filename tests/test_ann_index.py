"""Persisted PQ index: build/load/query identity, frozen-codebook
append with commit-marker idempotence, and streaming ingest parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark.operators.ann_index import (
    append_pq_index,
    build_pq_index,
    load_pq_index,
)
from etl_weather_spark.operators.similarity import (
    cosine_topk_pq,
    pq_encode,
    pq_train_codebooks,
)
from etl_weather_spark.sources.snapshots import snapshot_history
from etl_weather_spark.streaming.ann_ingest import stream_ann_ingest

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_build_load_query_equals_direct(spark, tmp_path):
    """save → load → query must return bit-identical rows to running
    cosine_topk_pq directly with the same codebooks (the index is a
    cache of the encode pass, never a different algorithm)."""
    emb = _emb(spark)
    path = str(tmp_path / "pq_index")
    idx = build_pq_index(emb, path)
    reloaded = load_pq_index(spark, path)
    assert (reloaded.books == idx.books).all()
    qs = emb.filter(F.col("vec_id") < 3)
    via_index = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in reloaded.query(emb, qs, k=5, shortlist=50).collect()
    }
    direct = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in cosine_topk_pq(
            emb, qs, k=5, shortlist=50, books=idx.books
        ).collect()
    }
    assert via_index == direct and len(via_index) > 0


def test_append_uses_frozen_codebooks_and_markers(spark, tmp_path):
    """Appended vectors must be encoded in the ORIGINAL code space
    (codes == pq_encode with the base codebooks, NOT retrained ones),
    and a replayed commit marker must be a no-op."""
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") % 5 != 0)
    extra = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "pq_index")
    idx = build_pq_index(base, path)
    append_pq_index(extra, path, marker="m1")
    reloaded = load_pq_index(spark, path)
    got = {tuple([r.vec_id] + list(r.codes)) for r in reloaded.codes.collect()}
    expected = {
        tuple([r.vec_id] + list(r.codes))
        for r in pq_encode(emb, idx.books).collect()
    }
    assert got == expected
    # retrained-on-extra codebooks would differ from the frozen ones
    retrained = pq_train_codebooks(extra)
    assert (retrained != idx.books).any()
    # replay: same marker, nothing changes
    n_hist = len(snapshot_history(str(tmp_path / "pq_index" / "codes")))
    append_pq_index(extra, path, marker="m1")
    assert len(snapshot_history(str(tmp_path / "pq_index" / "codes"))) == n_hist
    assert load_pq_index(spark, path).codes.count() == emb.count()


def test_compaction_preserves_codes_and_serving(spark, tmp_path):
    """After many small appends, compaction rewrites the file layout
    into a new version without changing a single code — queries against
    the compacted index are bit-identical."""
    from etl_weather_spark.operators.ann_index import compact_pq_index

    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 30)
    path = str(tmp_path / "pq_index")
    build_pq_index(base, path)
    for i, lo in enumerate(range(30, 90, 20)):
        chunk = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 20))
        append_pq_index(chunk, path, marker=f"m{i}")
    before = {
        tuple([r.vec_id] + list(r.codes))
        for r in load_pq_index(spark, path).codes.collect()
    }
    v = compact_pq_index(spark, path)
    assert v > 0
    after_idx = load_pq_index(spark, path)
    after = {tuple([r.vec_id] + list(r.codes)) for r in after_idx.codes.collect()}
    assert after == before
    qs = emb.filter(F.col("vec_id") == 7)
    assert after_idx.query(emb, qs, k=3, shortlist=30).count() == 3


def test_streaming_ingest_matches_batch_encode(spark, tmp_path):
    """Streamed micro-batches land the same code table as one batch
    encode of everything with the frozen codebooks, and a planted
    duplicate vector is retrieved as its twin's top neighbor."""
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 40)
    b1 = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 60))
    b2 = emb.filter(F.col("vec_id") >= 60)
    path = str(tmp_path / "pq_index")
    idx = build_pq_index(base, path)

    src = str(tmp_path / "incoming")
    b1.coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    b2.coalesce(1).write.mode("overwrite").parquet(f"{src}/b2")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = stream_ann_ingest(
        stream, index_path=path, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    reloaded = load_pq_index(spark, path)
    got = {tuple([r.vec_id] + list(r.codes)) for r in reloaded.codes.collect()}
    expected = {
        tuple([r.vec_id] + list(r.codes))
        for r in pq_encode(emb, idx.books).collect()
    }
    assert got == expected
    # retrieval sanity over the grown index: each query's own twin
    # region should surface — top-1 neighbor of a query vector that was
    # streamed in is deterministic and present
    qs = emb.filter(F.col("vec_id") == 50)
    top = reloaded.query(emb, qs, k=3, shortlist=30).collect()
    assert len(top) == 3 and all(r.query_id == 50 for r in top)
