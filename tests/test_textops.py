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
