"""Crafted-input SEMANTICS tests for the round-7 wave-2+ registry
queries — the oracle suite proves cross-engine parity; these pin what
the operators are supposed to MEAN on inputs where the right answer is
computable by hand (the gopher/boilerplate crafted-test discipline).

Each test writes a tiny synthetic documents/embeddings table into
tmp_path and calls the registered query on that directory (the queries
are sf_dir-closures over exactly these tables).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark import queries as q


def _write_docs(spark, d, rows):
    """rows: (doc_id, text, lang, source) — n_chars derived as len(text)
    like the driver's synthetic tables."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for (i, t, lg, s) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def _write_emb(spark, d, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return str(d)


def _words(n, start=0):
    return " ".join(f"w{i}" for i in range(start, start + n))


def test_script_mixture_branches_and_dominance(spark, tmp_path):
    """Each seed branch fires on its doc_id residue; dominance follows
    the char counts with the fixed latin>cyr>cjk>greek tie order."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, _words(10), "en", "s0"),     # plain latin, not mixed
            (9, _words(10), "en", "s0"),     # %89=9 -> cyrillic REPLACEMENT
            (11, _words(10), "en", "s0"),    # %101=11 -> cjk REPLACEMENT
            (3, _words(30), "en", "s0"),     # %7=3 -> cyrillic APPEND (mixed, latin-dom)
        ],
    )
    out = {(r.dominant_script, r.mixed_script): r
           for r in q.script_mixture_audit(spark, sf).collect()}
    assert out[("latin", False)].id_checksum == 0
    assert out[("latin", True)].id_checksum == 3
    # replacements contain no latin letters at all -> pure, not mixed
    assert out[("cyrillic", False)].id_checksum == 9
    assert out[("cjk", False)].id_checksum == 11
    assert out[("cyrillic", False)].latin_chars == 0
    assert out[("cjk", False)].cjk_chars > 0


def test_c4_line_filters_rules_and_doc_keep(spark, tmp_path):
    """12-token lines; terminal '.' seeded when (doc_id+line)%3 != 0;
    doc kept iff >=3 surviving lines and no lorem ipsum."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            # doc 1: 48 tokens -> 4 lines; (1+i)%3 -> lines 0,1,3 get '.'
            # all 12-word, no js/brace -> 3 kept -> doc kept
            (1, _words(48), "en", "a"),
            # doc 2: 36 tokens -> 3 lines; (2+i)%3 -> lines 0,2 get '.'
            # -> 2 kept -> doc dropped (under 3 lines)
            (2, _words(36), "en", "b"),
            # doc 17: %13=4 -> line 0 prefixed 'javascript ' -> js drop;
            # 48 tokens -> 4 lines; (17+i)%3 -> i=0 no '.' (js anyway),
            # i=1,2 get '.', i=3 no -> kept = 2 -> doc dropped
            (17, _words(48), "en", "c"),
            # doc 13: %97=13 -> line 0 gets 'lorem ipsum ' -> doc killed
            # even though 4 lines would survive otherwise
            (13, _words(60), "en", "d"),
        ],
    )
    out = {r.source: r for r in q.c4_line_filters(spark, sf).collect()}
    assert out["a"].docs_kept == 1 and out["a"].lines_kept == 3
    assert out["a"].no_punct_lines == 1
    assert out["b"].docs_kept == 0 and out["b"].lines_kept == 2
    assert out["c"].docs_kept == 0 and out["c"].js_lines == 1
    # lorem doc: line 0 starts 'lorem ipsum' AND (13+0)%3!=0 appends '.';
    # 14-word line, no banned token among rules (lorem only kills the DOC)
    assert out["d"].docs_kept == 0 and out["d"].n_docs == 1


def test_c4_empty_doc_yields_one_short_line_both_engines(spark, tmp_path):
    """Round-7 review: a zero-token doc must yield exactly ONE empty
    line judged 'short' on BOTH engines — Spark's sequence(0,-1)
    DESCENDS where DuckDB's generate_series(0,-1) is empty (guarded
    with GREATEST(...,1)), and DuckDB's array_to_string([]) is NULL
    where Spark's array_join([]) is '' (guarded with COALESCE; the
    NULL line used to fall through every CASE arm to 'kept')."""
    import duckdb

    sf = _write_docs(
        spark, tmp_path, [(0, "", "en", "s"), (1, _words(48), "en", "s")]
    )
    srows = [tuple(r) for r in q.c4_line_filters(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    orows = con.execute(q._ORACLES["c4_line_filters"]).fetchall()
    con.close()
    assert srows == orows
    r = srows[0]
    # 5 lines total (4 real + 1 empty), empty judged short, doc 1 kept
    assert r[3] == 5 and r[2] == 1 and r[7] == 1


def test_psi_identical_sources_score_zero_and_stable(spark, tmp_path):
    rows = []
    for s in ("a", "b"):
        for i in range(100):
            rows.append((len(rows), "x " * (i % 5 + 1), "en", s))
    sf = _write_docs(spark, tmp_path, rows)
    for r in q.psi_drift_audit(spark, sf).collect():
        assert r.psi6 == 0.0 and r.psi_level == "stable"


def test_psi_disjoint_source_is_shifted(spark, tmp_path):
    rows = [(i, "x" * 40, "en", "a") for i in range(100)]
    rows += [(100 + i, "y" * 900, "en", "b") for i in range(100)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q.psi_drift_audit(spark, sf).collect()}
    assert out["a"].psi_level == "shifted" and out["a"].psi6 > 0.25
    assert out["b"].psi_level == "shifted"


def test_jsd_single_source_is_zero(spark, tmp_path):
    sf = _write_docs(
        spark, tmp_path, [(i, _words(20), "en", "only") for i in range(10)]
    )
    r = q.js_divergence_sources(spark, sf).collect()
    assert len(r) == 1 and r[0].jsd6 == 0.0


def test_jsd_bounded_by_ln2_and_orders_divergence(spark, tmp_path):
    """JSD(nats) <= ln 2 ≈ 0.6931; a source sharing no tokens with the
    rest sits near the bound, a near-identical source near 0."""
    rows = [(i, "alpha beta gamma delta", "en", "same") for i in range(50)]
    rows += [(100 + i, "alpha beta gamma delta", "en", "twin") for i in range(50)]
    rows += [(200 + i, "zeta eta theta iota", "en", "alien") for i in range(50)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q.js_divergence_sources(spark, sf).collect()}
    assert all(r.jsd6 <= 0.6932 for r in out.values())
    assert out["alien"].jsd6 > out["same"].jsd6 > 0.0


def test_burstiness_mean_occurrences_per_containing_doc(spark, tmp_path):
    """'bursty' occurs 3x in each of 5 docs -> cf/df = 3.0 and it must
    out-rank the flat fillers (df>=5 support keeps singletons out)."""
    rows = [
        (i, "bursty bursty bursty " + _words(5), "en", "s") for i in range(5)
    ]
    rows += [(10 + i, _words(5), "en", "s") for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    out = q.token_burstiness_topk(spark, sf).collect()
    assert out[0].tok == "bursty"
    assert out[0].cf == 15 and out[0].df == 5
    assert out[0].burstiness4 == 3.0
    # fillers appear once per doc in 10 docs -> 1.0
    flat = {r.tok: r for r in out if r.tok != "bursty"}
    assert all(r.burstiness4 == 1.0 and r.df == 10 for r in flat.values())


def test_shard_assignment_is_content_addressed(spark, tmp_path):
    """Same rows, different physical layout -> identical shard table
    (the whole point of hashing doc_id instead of partition index)."""
    rows = [(i, _words(6), "en", "s") for i in range(500)]
    sf = _write_docs(spark, tmp_path, rows)
    a = q.shard_assignment_stats(spark, sf).collect()
    df = spark.createDataFrame(
        [(i, _words(6), "en", "s", len(_words(6))) for i in range(500)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(13)
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    b = q.shard_assignment_stats(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert sum(r.n_docs for r in a) == 500


def test_epoch_plan_flags_over_repeated_small_source(spark, tmp_path):
    """1:99 token split at a 2x budget: the sqrt-boosted small source
    needs ~18 epochs (flagged); the big one stays under 2 (not)."""
    rows = [(0, _words(10), "en", "small")]
    rows += [(1 + i, _words(99), "en", "big") for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q.epoch_sampling_plan(spark, sf).collect()}
    assert out["small"].over_four_epochs is True
    assert out["big"].over_four_epochs is False
    assert out["small"].epochs4 > 4.0 and out["big"].epochs4 < 4.0
    # budget conservation: allocations sum to ~2x total tokens
    total = sum(r.n_tokens for r in out.values())
    alloc = sum(r.alloc_tokens for r in out.values())
    assert abs(alloc - 2 * total) <= 2  # integer flooring slack


def test_resemblance_sketch_identical_and_disjoint(spark, tmp_path):
    """Identical halves -> exact and estimated Jaccard both 1.0 (every
    per-seed min agrees); disjoint halves -> both 0.0."""
    text_a = _words(30)
    rows = [(i, text_a, "en", "s") for i in range(10)]  # same shingles both halves
    sf = _write_docs(spark, tmp_path, rows)
    r = q.corpus_resemblance_sketch(spark, sf).collect()[0]
    assert r.exact_j4 == 1.0 and r.est_j4 == 1.0 and r.n_agree == 16

    rows = [(2 * i, _words(30), "en", "s") for i in range(5)]
    rows += [(2 * i + 1, _words(30, start=1000), "en", "s") for i in range(5)]
    sf = _write_docs(spark, tmp_path / "b", rows)
    r = q.corpus_resemblance_sketch(spark, sf).collect()[0]
    assert r.exact_j4 == 0.0 and r.n_inter == 0
    # disjoint md5 min collisions are possible in principle, never for
    # this fixed input (deterministic): all 16 seeds disagree
    assert r.n_agree == 0 and r.est_j4 == 0.0


def test_knn_outlier_flags_the_opposite_vector(spark, tmp_path):
    """10 identical unit vectors + 1 exactly opposite: the opposite one
    is rank 1 with mean distance 2.0 (cos = -1 to every neighbor);
    the identical ones score 0.0."""
    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    opp = [-1.0] + [0.0] * (dim - 1)
    rows = [(i, base, 0) for i in range(10)] + [(99, opp, 1)]
    sf = _write_emb(spark, tmp_path, rows)
    out = q.embedding_outlier_knn(spark, sf).collect()
    assert out[0].vec_id == 99 and out[0].knn_dist6 == 2.0
    assert all(r.knn_dist6 == 0.0 for r in out[1:])


def test_heaps_flat_on_fixed_vocab_corpus(spark, tmp_path):
    """A corpus where every doc reuses the SAME vocabulary: vocabulary
    stops growing after decile 1, so the fitted beta collapses toward 0
    (the duplicated-corpus signature the diagnostic exists to show)."""
    rows = [(i, _words(20), "en", "s") for i in range(100)]
    sf = _write_docs(spark, tmp_path, rows)
    r = q.heaps_law_fit(spark, sf).collect()[0]
    assert r.vocab_total == 20
    assert r.n_points == 10
    assert abs(r.beta6) < 0.01


def test_kcenter_matches_pure_python_greedy(spark, tmp_path):
    """Independent replay: greedy farthest-point with the same 6-dp
    quantization and tie-breaks, in plain Python — the selections must
    match round for round (the kmeans independent-replay discipline)."""
    import math
    import random

    rng = random.Random(7)
    dim = 6
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], i % 3)
        for i in range(40)
    ]
    sf = _write_emb(
        spark, tmp_path, [(i, [float(x) for x in v], lb) for i, v, lb in rows]
    )

    def d6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = max(math.sqrt(sum(x * x for x in a)), 1e-12)
        nb = max(math.sqrt(sum(x * x for x in b)), 1e-12)
        return math.floor((1 - dot / (na * nb)) * 1e6 + 0.5) / 1e6

    vecs = {i: v for i, v, _ in rows}
    chosen = [0]  # lowest vec_id seeds
    expect = [(1, 0, None)]
    for rnd_i in range(2, 9):
        best = None
        for i in sorted(vecs):
            if i in chosen:
                continue
            md = min(d6(vecs[i], vecs[c]) for c in chosen)
            if best is None or md > best[1] or (md == best[1] and i < best[0]):
                best = (i, md)
        chosen.append(best[0])
        expect.append((rnd_i, best[0], best[1]))

    got = [
        (r.round, r.vec_id, r.sel_dist6)
        for r in q.kcenter_coreset_selection(spark, sf).collect()
    ]
    assert got == expect


def test_cluster_size_histogram_conserves_membership(spark, sf_dir):
    """Invariants against the registered clustering: sizes×counts sum
    back to the full membership, removable = docs − clusters at every
    size, and doc shares sum to 1."""
    hist = q.dup_cluster_size_histogram(spark, sf_dir).collect()
    cc = q.dedup_clusters(spark, sf_dir)
    n_docs = cc.count()
    n_clusters = cc.select("cluster_id").distinct().count()
    assert sum(r.n_docs_at_size for r in hist) == n_docs
    assert sum(r.n_clusters for r in hist) == n_clusters
    for r in hist:
        assert r.removable_at_size == r.n_docs_at_size - r.n_clusters
    assert abs(sum(r.doc_share6 for r in hist) - 1.0) < 1e-4


def test_release_report_rates_are_consistent(spark, sf_dir):
    """On the real sf0.001 tables: every rate sits in [0,1] and the
    dup/keep rates agree with their standalone audits recomputed here."""
    r = q.corpus_release_report(spark, sf_dir).collect()[0]
    for c in ("dup_rate6", "pii_rate6", "shingle_contam_rate6",
              "semantic_contam_rate6", "gopher_keep_rate6",
              "mixed_script_share6"):
        assert 0.0 <= getattr(r, c) <= 1.0, c
    import math

    gq = q.gopher_quality_gate(spark, sf_dir)
    kept = gq.filter(F.col("keep")).count()
    total = gq.count()
    # the query's rnd() is floor(x*1e6 + 0.5)/1e6 — replicate exactly
    assert r.gopher_keep_rate6 == math.floor(kept / total * 1e6 + 0.5) / 1e6
