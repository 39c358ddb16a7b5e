"""Semantic tests for text analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark.operators.textops import doc_profile, lang_id, quality_score


def test_lang_id(spark):
    rows = [
        (1, "the cat and the dog of to in"),
        (2, "el que de los la casa"),
        (3, "le chat et les des maisons"),
        (4, "der hund und die das ist"),
        (5, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lp for r in df.select("doc_id", lang_id(F.col("text")).alias("lp")).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_quality_score_bounds(spark):
    rows = [(1, "the " * 120), (2, "!!! ### $$$"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r.q for r in df.select(quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= q <= 1.0 for q in got)
    assert got[0] > got[1]  # prose beats symbol soup


def test_doc_profile_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = doc_profile(docs)
    assert {"n_tokens", "n_bpe_tokens", "lang_pred", "quality"} <= set(prof.columns)
    row = prof.filter(F.col("n_tokens") > 0).limit(1).collect()[0]
    assert row.n_bpe_tokens >= row.n_tokens  # BPE-ish splits at least at words


def test_chunk_documents_invariants(spark):
    from etl_weather_spark.operators.textops import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(95))),   # 95 toks -> 3 chunks
        (2, " ".join(f"w{i}" for i in range(40))),   # exactly one stride
        (3, "solo"),                                  # short doc -> 1 chunk
        (4, ""),                                      # empty -> [''] -> 1 chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, size=50, stride=40).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)

    assert [len(v) for _, v in sorted(by_doc.items())] == [3, 1, 1, 1]
    d1 = by_doc[1]
    # starts advance by the stride; sizes clamp at the tail
    assert [c.chunk_start for c in d1] == [0, 40, 80]
    assert [c.n_tokens for c in d1] == [50, 50, 15]
    # consecutive chunks overlap by size - stride = 10 tokens
    for a, b in zip(d1, d1[1:]):
        assert a.chunk_text.split()[-10:] == b.chunk_text.split()[:10]
    # full coverage: union of chunks (dedup by position) == the doc
    seen = {}
    for c in d1:
        for i, t in enumerate(c.chunk_text.split()):
            seen[c.chunk_start + i] = t
    assert [seen[i] for i in range(95)] == [f"w{i}" for i in range(95)]
    assert by_doc[3][0].chunk_text == "solo"
