"""Crafted-input SEMANTICS tests for the round-7 wave-4 queries
(join_skew_audit / readability_flesch_gate / cross_source_dup_matrix /
ann_ivf_recall_audit) — the oracle suite proves cross-engine parity;
these pin what the operators MEAN on inputs where the right answer is
computable by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_weather_spark import queries as q
from etl_weather_spark.operators.skew import key_skew_profile


def _write_docs(spark, d, rows):
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for (i, t, lg, s) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def _write_emb(spark, d, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


# ---------------------------------------------------------------------------
# key_skew_profile
# ---------------------------------------------------------------------------


def test_key_skew_profile_hand_computed(spark):
    """17 rows over 5 keys (one NULL): every output column checked
    against the hand-computed distribution, including the exact-p99
    definition (smallest m with cum_keys*100 >= 99*n_keys)."""
    rows = (
        [("a",)] * 10 + [("b",)] * 2 + [("c",)] * 1 + [("d",)] * 1 + [(None,)] * 3
    )
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", "t.k").collect()[0]
    assert out["rel_key"] == "t.k"
    assert out["n_rows"] == 17
    assert out["n_keys"] == 5
    assert out["max_mult"] == 10
    assert out["hot_key"] == "a"
    # multiplicities {1:2, 2:1, 3:1, 10:1}; cum: 1→2, 2→3, 3→4, 10→5;
    # need cum*100 >= 495 → first at m=10
    assert out["p99_mult"] == 10
    assert out["avg_mult6"] == 3.4
    assert out["skew6"] == math.floor(10 * 5 / 17 * 1e6 + 0.5) / 1e6
    assert out["hot_share6"] == math.floor(10 / 17 * 1e6 + 0.5) / 1e6
    # 10 * 5 = 50 <= 4 * 17 = 68 → no salting
    assert out["salting_recommended"] is False


def test_key_skew_profile_uniform_and_hot(spark):
    uniform = spark.createDataFrame([(i % 8,) for i in range(64)], "k long")
    row = key_skew_profile(uniform, "k", "u").collect()[0]
    assert row["skew6"] == 1.0 and row["p99_mult"] == 8
    assert row["salting_recommended"] is False
    hot = spark.createDataFrame(
        [(0,)] * 96 + [(i,) for i in range(1, 17)], "k long"
    )
    row = key_skew_profile(hot, "k", "h").collect()[0]
    # avg = 112/17 ≈ 6.59, max = 96 > 4×avg → salt
    assert row["max_mult"] == 96 and row["salting_recommended"] is True
    assert row["hot_key"] == "0"


def test_key_skew_profile_null_keys_grouped(spark):
    df = spark.createDataFrame([(None,), (None,), (1,)], "k long")
    row = key_skew_profile(df, "k", "n").collect()[0]
    assert row["n_keys"] == 2 and row["hot_key"] == "<null>"


# ---------------------------------------------------------------------------
# readability_flesch_gate
# ---------------------------------------------------------------------------


def test_readability_hand_scored(spark, tmp_path):
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, "The cat sat.", "en", "s"),
            (2, "university education organization", "en", "s"),
            (3, "", "en", "s"),
        ],
    )
    rows = {r["doc_id"]: r for r in q.queries()["readability_flesch_gate"](spark, d).collect()}
    r1 = rows[1]
    # words=3, sentences=1, vowel groups: e, a, a → 3
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (3, 1, 3)
    flesch = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert r1["flesch6"] == math.floor(flesch * 1e6 + 0.5) / 1e6
    assert r1["band"] == "easy"
    assert r1["keep"] is False  # n_words < 5
    r2 = rows[2]
    # university(u,i,e,i,y)=5  education(e,u,a,io)=4  organization(o,a,i,a,io)=5
    assert r2["n_syllables"] == 14 and r2["n_sentences"] == 1
    assert r2["band"] == "very_difficult" and r2["keep"] is False
    r3 = rows[3]
    # empty doc: 0 words, clamped 1 sentence, 0 syllables → flesch 206.835
    assert (r3["n_words"], r3["n_sentences"], r3["n_syllables"]) == (0, 1, 0)
    assert r3["band"] == "easy" and r3["keep"] is False


def test_readability_gate_keeps_simple_long_doc(spark, tmp_path):
    simple = " ".join(["The cat sat on a mat."] * 4)  # 24 words, 4 sentences
    d = _write_docs(spark, tmp_path, [(1, simple, "en", "s")])
    r = q.queries()["readability_flesch_gate"](spark, d).collect()[0]
    assert r["n_words"] == 24 and r["n_sentences"] == 4
    assert r["band"] == "easy" and r["keep"] is True


# ---------------------------------------------------------------------------
# cross_source_dup_matrix
# ---------------------------------------------------------------------------


def test_cross_source_dup_matrix_hand_counted(spark, tmp_path):
    """Three identical docs (2 in srcA, 1 in srcB) + one unique doc in
    srcB: the matrix must report AA=1, AB=2, BB=0 dup pairs over
    possible 1, 4, 1 — zero cells materialized."""
    same = " ".join(f"tok{i}" for i in range(30))
    uniq = " ".join(f"zzz{i}" for i in range(30))
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, same, "en", "srcA"),
            (2, same, "en", "srcA"),
            (3, same, "en", "srcB"),
            (4, uniq, "en", "srcB"),
        ],
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in q.queries()["cross_source_dup_matrix"](spark, d).collect()
    }
    assert set(out) == {("srcA", "srcA"), ("srcA", "srcB"), ("srcB", "srcB")}
    aa, ab, bb = out[("srcA", "srcA")], out[("srcA", "srcB")], out[("srcB", "srcB")]
    assert (aa["dup_pairs"], aa["possible_pairs"]) == (1, 1)
    assert (ab["dup_pairs"], ab["possible_pairs"]) == (2, 4)
    assert (bb["dup_pairs"], bb["possible_pairs"]) == (0, 1)
    assert aa["dup_ppm2"] == 1000000.0
    assert ab["dup_ppm2"] == 500000.0
    assert bb["dup_ppm2"] == 0.0
    assert (ab["docs_a"], ab["docs_b"]) == (2, 2)


# ---------------------------------------------------------------------------
# ann_ivf_recall_audit
# ---------------------------------------------------------------------------


def test_ivf_recall_perfect_on_separable_clusters(spark, tmp_path):
    """40 vectors on 4 orthogonal axes (id % 4 → axis, so the 4 lowest-id
    kmeans seeds span all clusters): every query's top-10 is its own
    9 cluster-mates plus the globally-smallest foreign id, which the
    tie-broken second probe always covers → recall@10 = 1.0 for all 8
    queries, 19 candidates each (9 own-cell + 10 second-cell)."""
    rows = []
    for i in range(40):
        v = [0.0] * 4
        v[i % 4] = 1.0
        rows.append((i, v, i % 4))
    d = _write_emb(spark, tmp_path, rows)
    out = q.queries()["ann_ivf_recall_audit"](spark, d).collect()
    assert len(out) == 8
    for r in out:
        assert r["n_candidates"] == 19
        assert r["n_exact"] == 10 and r["n_approx"] == 10
        assert r["n_hit"] == 10 and r["recall4"] == 1.0


def test_ivf_recall_bounded_and_consistent(spark, sf_dir):
    out = q.queries()["ann_ivf_recall_audit"](spark, sf_dir).collect()
    assert len(out) == 8
    for r in out:
        assert 0 <= r["n_hit"] <= r["n_approx"] <= 10
        assert r["n_exact"] == 10
        assert 0.0 <= r["recall4"] <= 1.0
        assert r["recall4"] == math.floor(r["n_hit"] / 10 * 1e4 + 0.5) / 1e4


# ---------------------------------------------------------------------------
# retrieval_ndcg_audit
# ---------------------------------------------------------------------------


def test_ndcg_perfect_when_only_full_matches_exist(spark, tmp_path):
    """Three docs contain all three query terms (identical term stats,
    so BM25 ranks them; nothing else scores): the judged list IS the
    ideal list → ndcg = recall = mrr = 1, precision@10 = 3/10."""
    full = "table scan merge " + " ".join(f"f{i}" for i in range(10))
    noise = " ".join(f"n{i}" for i in range(13))
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, full, "en", "s"),
            (2, full, "en", "s"),
            (3, full, "en", "s"),
            (4, noise, "en", "s"),
            (5, noise, "en", "s"),
        ],
    )
    r = q.queries()["retrieval_ndcg_audit"](spark, d).collect()[0]
    assert r["n_relevant"] == 3 and r["n_retrieved"] == 3
    assert r["hits10"] == 3
    assert r["precision10_6"] == 0.3
    assert r["recall10_6"] == 1.0
    assert r["mrr6"] == 1.0
    assert r["ndcg10_6"] == 1.0
    assert r["dcg10_6"] == r["idcg10_6"] > 0


def test_ndcg_penalizes_tf_spam_above_topical_match(spark, tmp_path):
    """A short doc stuffed with one term outranks the true 3-term match
    under BM25 (classic tf spam), so the graded audit must report
    ndcg < 1 while mrr tracks where the real match actually landed."""
    spam = " ".join(["table"] * 8)
    match = "table scan merge " + " ".join(f"f{i}" for i in range(120))
    d = _write_docs(
        spark,
        tmp_path,
        [(1, spam, "en", "s"), (2, match, "en", "s")]
        + [(10 + i, " ".join(f"n{j}" for j in range(12)), "en", "s") for i in range(4)],
    )
    ranked = {
        r["doc_id"]: r["rank"]
        for r in q.queries()["bm25_topk"](spark, d).collect()
    }
    assert ranked[1] < ranked[2], "crafted tf-spam doc must outrank the match"
    r = q.queries()["retrieval_ndcg_audit"](spark, d).collect()[0]
    assert r["n_relevant"] == 1  # only doc 2 has >= 2 terms
    assert r["ndcg10_6"] < 1.0
    assert r["mrr6"] == math.floor(1.0 / ranked[2] * 1e6 + 0.5) / 1e6
    assert r["recall10_6"] == 1.0 and r["hits10"] == 1


# ---------------------------------------------------------------------------
# audio_envelope_dedup
# ---------------------------------------------------------------------------


def test_audio_envelope_invariances(spark):
    """The fingerprint must be invariant to exact amplitude halving and
    to the sample-rate header, and must differ for a different
    envelope shape — asserted directly on the operator."""
    import numpy as np

    from etl_weather_spark.operators.multimodal import (
        audio_envelope_fingerprint,
        encode_wav,
    )

    i = np.arange(256, dtype=np.int64)
    amp_a = 1 + ((i // 16) * 5) % 12
    amp_b = 1 + (7 + (i // 16) * 5) % 12  # a different group's envelope
    base = 2 * (((i * 17) % 128) - 64)
    clips = [
        (1, encode_wav((amp_a * base).reshape(256, 1), 8000)),
        (2, encode_wav(((amp_a * base) // 2).reshape(256, 1), 8000)),  # gain
        (3, encode_wav((amp_a * base).reshape(256, 1), 16000)),  # rate
        (4, encode_wav((amp_b * base).reshape(256, 1), 8000)),  # shape
    ]
    df = spark.createDataFrame(clips, "media_id long, payload binary")
    fps = {
        r["media_id"]: r["fp"]
        for r in audio_envelope_fingerprint(df, n_bands=16).collect()
    }
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_audio_envelope_dedup_group_structure(spark, sf_dir):
    """48 clips in 12 signal groups of 4 (2 amplitudes x varying
    rates): every within-group pair collides and no cross-group pair
    does — 72 pairs, including cross-rate ones."""
    rows = q.queries()["audio_envelope_dedup"](spark, sf_dir).collect()
    assert len(rows) == 72
    for r in rows:
        assert r["id_a"] % 12 == r["id_b"] % 12
    assert any(r["cross_rate"] for r in rows)
    # amplitude-crossing pairs (replica axis did // 12 flips s) too
    assert any(
        ((r["id_a"] // 12) % 2) != ((r["id_b"] // 12) % 2) for r in rows
    )


# ---------------------------------------------------------------------------
# zorder_pruning_audit
# ---------------------------------------------------------------------------


def _write_orders(spark, d, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    return str(d)


def test_zorder_beats_linear_on_uniform_grid(spark, tmp_path):
    """64x64 uniform (custkey, day) grid: the date-ordered layout must
    read every date-band file that overlaps the probe's date range but
    ALL customers inside it, while the Z-order layout co-locates the
    2-D box — strictly better pruning and lower read amplification."""
    import datetime

    rows = []
    k = 0
    for cust in range(64):
        for day in range(64):
            rows.append(
                (
                    k,
                    cust,
                    "F",
                    1.0,
                    datetime.datetime(1995, 1, 1)
                    + datetime.timedelta(days=day),
                    "1-URGENT",
                )
            )
            k += 1
    d = _write_orders(spark, tmp_path, rows)
    out = {
        r["layout"]: r
        for r in q.queries()["zorder_pruning_audit"](spark, d).collect()
    }
    lin, zo = out["linear"], out["zorder"]
    assert lin["n_files"] == 64 and zo["n_files"] <= 64
    assert lin["n_matching"] == zo["n_matching"] > 0
    assert zo["pruning_rate6"] > lin["pruning_rate6"]
    assert zo["read_amplification6"] < lin["read_amplification6"]
    assert zo["read_amplification6"] >= 1.0


def test_zorder_audit_invariants_on_synthetic_tables(spark, sf_dir):
    out = {
        r["layout"]: r
        for r in q.queries()["zorder_pruning_audit"](spark, sf_dir).collect()
    }
    assert set(out) == {"linear", "zorder"}
    for r in out.values():
        assert 1 <= r["files_touched"] <= r["n_files"] <= 64
        assert r["rows_in_touched"] >= r["n_matching"]
        assert r["read_amplification6"] >= 1.0
    assert out["zorder"]["n_matching"] == out["linear"]["n_matching"]


# ---------------------------------------------------------------------------
# quality_pr_curve
# ---------------------------------------------------------------------------


def test_pr_curve_monotone_and_consistent(spark, sf_dir):
    """Raising the threshold can only shrink the predicted-positive
    set: tp and fp are non-increasing in threshold, fn/tn
    non-decreasing, recall non-increasing; every row's confusion
    counts sum to the corpus size."""
    rows = q.queries()["quality_pr_curve"](spark, sf_dir).collect()
    assert len(rows) == 9
    total = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in rows}
    assert len(total) == 1 and total.pop() > 0
    by_t = sorted(rows, key=lambda r: r["threshold"])
    for a, b in zip(by_t, by_t[1:]):
        assert b["tp"] <= a["tp"] and b["fp"] <= a["fp"]
        assert b["fn"] >= a["fn"] and b["tn"] >= a["tn"]
        assert b["recall6"] <= a["recall6"]


def test_pr_curve_hand_computed_on_crafted_corpus(spark, tmp_path):
    """Docs engineered so classifier keep and rule label disagree on
    known docs: a diverse long doc (both keep), a one-token-repeated
    doc (both drop), and a stopword-free but diverse doc (classifier
    keeps at z>0, Gopher drops on the stop-word floor) — at threshold
    0.0 that third doc is the single false positive."""
    diverse = "the and of to in " + " ".join(f"word{i}" for i in range(60))
    repeated = " ".join(["spam"] * 60)
    nostop = " ".join(f"vocab{i}" for i in range(60))
    d = _write_docs(
        spark,
        tmp_path,
        [(1, diverse, "en", "s"), (2, repeated, "en", "s"), (3, nostop, "en", "s")],
    )
    scores = {
        r["doc_id"]: r
        for r in q.queries()["quality_logistic_filter"](spark, d).collect()
    }
    labels = {
        r["doc_id"]: r["keep"]
        for r in q.queries()["gopher_quality_gate"](spark, d).collect()
    }
    assert scores[1]["keep"] and labels[1]
    assert not scores[2]["keep"] and not labels[2]
    assert scores[3]["keep"] and not labels[3]  # the planted FP
    row = next(
        r
        for r in q.queries()["quality_pr_curve"](spark, d).collect()
        if r["threshold"] == 0.0
    )
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (1, 1, 0, 1)
    assert row["precision6"] == 0.5 and row["recall6"] == 1.0


# ---------------------------------------------------------------------------
# dedup_threshold_sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_monotone_and_hand_counted(spark, tmp_path):
    """Identical docs pair at j=1.0 (all thresholds); a half-overlap
    pair qualifies only at the 0.5 row; counts are non-increasing in
    threshold."""
    a = " ".join(f"tok{i}" for i in range(24))
    # share exactly the first 16 of a's 22 trigrams: same first 18
    # tokens, distinct tail -> jaccard between 0.5 and 0.6
    b = " ".join(f"tok{i}" for i in range(18)) + " " + " ".join(
        f"zzz{i}" for i in range(6)
    )
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, a, "en", "s"),
            (2, a, "en", "s"),
            (3, b, "en", "s"),
            (4, " ".join(f"qqq{i}" for i in range(24)), "en", "s"),
        ],
    )
    rows = {
        r["threshold"]: r
        for r in q.queries()["dedup_threshold_sweep"](spark, d).collect()
    }
    assert set(rows) == {0.5, 0.6, 0.7, 0.8, 0.9}
    # exact-dup pair (1,2) at every threshold
    assert rows[0.9]["n_pairs"] == 1 and rows[0.9]["n_dup_docs"] == 2
    # the partial-overlap pair only widens the 0.5 row
    assert rows[0.5]["n_pairs"] >= 2 and rows[0.5]["n_dup_docs"] >= 3
    prev = None
    for t in [0.5, 0.6, 0.7, 0.8, 0.9]:
        if prev is not None:
            assert rows[t]["n_pairs"] <= prev["n_pairs"]
            assert rows[t]["n_dup_docs"] <= prev["n_dup_docs"]
        prev = rows[t]
    assert rows[0.9]["dup_doc_share6"] == 0.5  # 2 of 4 docs


# ---------------------------------------------------------------------------
# langid_confusion_matrix
# ---------------------------------------------------------------------------


def test_langid_confusion_hand_built(spark, tmp_path):
    """Two correctly-detected docs, one planted confusion (labeled es,
    English stopwords) and one undetectable: cells, row shares and
    accuracy all hand-checkable."""
    en = "the cat and the dog of the house to go in peace " * 3
    es = "el perro de la casa que los gatos de la calle " * 3
    fake_es = "the cat and the dog of the house to go in peace " * 3
    und = "qqq www eee rrr ttt yyy uuu iii ooo ppp"
    d = _write_docs(
        spark,
        tmp_path,
        [
            (1, en, "en", "s"),
            (2, es, "es", "s"),
            (3, fake_es, "es", "s"),
            (4, und, "xx", "s"),
        ],
    )
    rows = {
        (r["lang"], r["lang_pred"]): r
        for r in q.queries()["langid_confusion_matrix"](spark, d).collect()
    }
    assert rows[("en", "en")]["n"] == 1
    assert rows[("es", "es")]["n"] == 1
    assert rows[("es", "en")]["n"] == 1  # the planted confusion
    assert rows[("xx", "und")]["n"] == 1
    assert rows[("es", "es")]["row_share6"] == 0.5
    assert rows[("es", "es")]["lang_total"] == 2
    # accuracy = 2 correct of 4 (xx != und counts as wrong)
    for r in rows.values():
        assert r["accuracy6"] == 0.5


# ---------------------------------------------------------------------------
# snapshot_diff_report
# ---------------------------------------------------------------------------


def test_snapshot_diff_hand_counted(spark, tmp_path):
    """Even ids = snapshot A, odd = snapshot B. srcX: one doc retained
    (same content both halves, whitespace-insensitively), one removed,
    one added; srcY: unchanged single doc pair."""
    d = _write_docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma", "en", "srcX"),   # A: retained twin
            (2, "old content here", "en", "srcX"),   # A: removed
            (1, "alpha  beta   gamma ", "en", "srcX"),  # B: same fp as 0
            (3, "brand new content", "en", "srcX"),  # B: added
            (4, "stable doc", "en", "srcY"),
            (5, "stable doc", "en", "srcY"),
        ],
    )
    out = {
        r["source"]: r
        for r in q.queries()["snapshot_diff_report"](spark, d).collect()
    }
    x, y = out["srcX"], out["srcY"]
    assert (x["n_a"], x["n_b"]) == (2, 2)
    assert (x["retained"], x["added"], x["removed"]) == (1, 1, 1)
    assert x["churn_rate6"] == 0.5
    assert (y["retained"], y["added"], y["removed"]) == (1, 0, 0)
    assert y["churn_rate6"] == 0.0
