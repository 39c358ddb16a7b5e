"""Round-9 additions: active-learning batch selection (uncertainty x
diversity greedy) and the trained-model data card v2 — semantics pinned
independently of the DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_weather_spark import queries as q


@pytest.fixture(scope="module")
def al_batch(spark, sf_dir):
    return q.queries()["active_learning_batch"](spark, sf_dir).collect()


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    """(doc_id, z, features) under the committed weights."""
    w = q._qct_weights(spark, sf_dir)
    train = q._qct_train_committed(spark, sf_dir)
    rows = (
        train.crossJoin(F.broadcast(w))
        .select("doc_id", "f_distinct", "f_top", "f_len", "f_stop",
                q._qct_z().alias("z"))
        .collect()
    )
    return {r.doc_id: r for r in rows}


def test_al_batch_shape_and_priority(al_batch):
    assert [r.pick for r in al_batch] == list(range(1, 11))
    assert len({r.doc_id for r in al_batch}) == 10  # all distinct
    for r in al_batch:
        assert 1 <= r.unc_rank <= 40  # every pick from the shortlist
    assert al_batch[0].sel_dist6 is None
    assert all(r.sel_dist6 is not None for r in al_batch[1:])


def test_al_batch_greedy_replay(al_batch, scored):
    """Independent pure-Python replay: shortlist by |z| (ties doc_id),
    then greedy farthest-point with 6-dp squared L2 — must reproduce
    the picks and distances exactly (the kcenter replay discipline)."""
    feats = ("f_distinct", "f_top", "f_len", "f_stop")

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    sl = sorted(scored.values(), key=lambda r: (abs(r.z), r.doc_id))[:40]

    def sqd(a, b) -> float:
        s = 0.0
        for f in feats:
            d = a[f] - b[f]
            s += d * d
        return q6(s)

    chosen = [sl[0]]
    picks = [(1, sl[0].doc_id, None)]
    for i in range(2, 11):
        cand = [r for r in sl if r.doc_id not in {c.doc_id for c in chosen}]
        best = max(cand, key=lambda r: (min(sqd(r, c) for c in chosen), -r.doc_id))
        picks.append((i, best.doc_id, min(sqd(best, c) for c in chosen)))
        chosen.append(best)

    got = [(r.pick, r.doc_id, r.sel_dist6) for r in al_batch]
    assert got == picks


def test_al_batch_pick1_is_most_uncertain(al_batch, scored):
    best = min(scored.values(), key=lambda r: (abs(r.z), r.doc_id))
    assert al_batch[0].doc_id == best.doc_id


@pytest.fixture(scope="module")
def card_v2(spark, sf_dir):
    return q.queries()["corpus_release_report_v2"](spark, sf_dir).collect()[0]


def test_card_v2_extends_v1_consistently(spark, sf_dir, card_v2):
    v1 = q.queries()["corpus_release_report"](spark, sf_dir).collect()[0]
    for c in v1.asDict():
        assert card_v2[c] == v1[c], c


def test_card_v2_trained_tier_matches_standalone_audits(spark, sf_dir, card_v2):
    pr = (
        q.queries()["quality_pr_curve_trained"](spark, sf_dir)
        .filter(F.col("model") == "trained")
        .collect()
    )
    assert card_v2.trained_best_f1_6 == max(r.f1_6 for r in pr)
    at0 = next(r for r in pr if r.threshold == 0.0)
    n = at0.tp + at0.fp + at0.fn + at0.tn
    assert card_v2.trained_keep_rate6 == math.floor(
        (at0.tp + at0.fp) / n * 1e6 + 0.5
    ) / 1e6
    ece = q.queries()["quality_calibration_curve"](spark, sf_dir).collect()[0].ece6
    assert card_v2.calibration_ece6 == ece
    mem = q._cc_membership_committed(spark, sf_dir).count()
    assert card_v2.neardup_doc_share6 == math.floor(
        mem / card_v2.n_docs * 1e6 + 0.5
    ) / 1e6
    assert 0.0 <= card_v2.t_closeness_max_tvd6 <= 1.0


def test_bpe_publish_equals_training(spark, sf_dir):
    """Committed merge table == retraining, bit for bit (the registry's
    determinism contract, tokenizer edition)."""
    pub = q.queries()["bpe_vocab_publish"](spark, sf_dir).collect()
    fresh = q.queries()["bpe_merge_rounds"](spark, sf_dir).collect()
    assert [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in pub
    ] == [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in fresh
    ]
    assert all(r.artifact == "bpe_merges" for r in pub)


def test_tokenizer_cost_report_consistency(spark, sf_dir):
    """Shares sum to ~1; totals equal the registered per-doc encode's
    corpus totals (cross-query consistency on committed bytes)."""
    rep = q.queries()["tokenizer_cost_report"](spark, sf_dir).collect()
    assert abs(sum(r.piece_share6 for r in rep) - 1.0) < 1e-4
    enc = q.queries()["bpe_encode_stats"](spark, sf_dir).collect()
    assert sum(r.n_pieces for r in rep) == sum(r.n_pieces for r in enc)
    assert sum(r.n_words for r in rep) == sum(r.n_words for r in enc)
    for r in rep:
        assert r.pieces_per_word_1e4 == (10000 * r.n_pieces) // r.n_words


def test_token_mixture_plan_semantics(spark, sf_dir):
    """Temperature flattening over token shares: q compresses toward
    uniform (head shrinks, tail grows), allocations ≈ budget, epochs
    consistent with alloc/own-tokens."""
    rows = q.queries()["token_mixture_plan"](spark, sf_dir).collect()
    total = sum(r.n_pieces for r in rows)
    assert abs(sum(r.q6 for r in rows) - 1.0) < 1e-4
    # allocation sums to the budget within per-source rounding
    assert abs(sum(r.alloc_tokens for r in rows) - total) <= len(rows)
    for r in rows:
        if r.piece_share6 and r.piece_share6 > 1 / len(rows):
            assert r.boost4 <= 1.0 + 1e-9  # head sources shrink
        if r.piece_share6 and r.piece_share6 < 1 / (4 * len(rows)):
            assert r.boost4 >= 1.0  # tail sources grow
        assert r.over_repeated == (r.alloc_tokens > 4 * r.n_pieces)
