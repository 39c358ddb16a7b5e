#!/usr/bin/env python
"""Scaling check for the dedup/text pipelines: 1x vs 10x corpus.

Builds a 10x documents corpus in /tmp by unioning 10 token-salted
replicas of sf0.1 (every token gets a per-replica suffix, so replicas
share NO shingles — near-dup density stays constant instead of every
doc acquiring 9 exact copies), then times the headline document
pipelines at both sizes. Near-linear wall-clock ratios are the
evidence that candidate generation is bucket-bound, not all-pairs.

Usage: python scripts/bench_scale.py [R] [op1,op2,...]   (default R=10, all OPS)
Prints one JSON line: {op: {"t1": s, "tR": s, "ratio": tR/t1,
                            "rows1": n, "rowsR": n}}
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_spark import queries as q  # noqa: E402
from etl_weather_spark.session import get_spark  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = f"/tmp/scale_{R}x"

OPS = [
    "dedup_exact",
    "minhash_lsh_fast",
    "winnow_candidates",
    "ngram_jaccard",
    "dedup_clusters",
    "token_budget_batches",
    "doc_stats",
    "ann_cosine_topk",
    "ann_cosine_lsh",
    "ann_cosine_ivf",
    # round-2 wave-2: iterative graph rounds over the dup-pair graph;
    # prefix-filtered exact similarity join
    "doc_pagerank",
    "prefix_filter_jaccard",
    # round-2 wave-3: Bloom novelty screen (bitmap build is the fixed
    # cost; probe is map-side), PQ ANN (code scan + shortlist re-rank),
    # embedding-graph dedup, cluster-unit split
    "bloom_screen_new_docs",
    "ann_cosine_pq",
    "semantic_dedup",
    "cluster_safe_split",
    # round-3: IVF-cell-blocked semantic dedup (K grows with sqrt(N), so
    # the 10x ratio should sit near prefix_filter's, far under the
    # fixed-label block's), canonical-pick pipeline on the swapped
    # prefix-filter generator
    "semantic_dedup_ivf",
    "dup_canonicals",
    # round-4: Lee-et-al exact-substring spans (hash-bucketed shingle-run
    # merging — ratio should track prefix_filter, not the naive ngram)
    "exact_substring_spans",
    "simhash_near_dupes",
    # round-4 wave-2: RRF hybrid retrieval (posting-filtered keyword leg
    # + broadcast dense leg — should be near-flat), vocab-level BPE
    # merge rounds (vocab grows ~Rx under token salting, so the ratio
    # tracks the vocab groupBy, not the token stream)
    "hybrid_search_rrf",
    "bpe_merge_rounds",
    # encode side: the vocab segmentation is constant-ish but the
    # doc-side join fans over the token stream — ratio should be
    # linear in rows, nothing worse
    "bpe_encode_stats",
    # round-5: rank-based tokenizer apply (vocab-bound Arrow pass +
    # token-stream join — same shape as the fold encode), and the
    # persisted-PQ serving roundtrip (build once per sf dir; the encode
    # pass scales with rows, the ADC scan with codes)
    "bpe_ranked_encode_stats",
    "ann_pq_index_roundtrip",
    # round-5 wave-2: per-doc windowed n-gram coverage (row-bound),
    # global sentence dedup (hash-keyed partial-agg groupBys),
    # distributed Lloyd k-means (N·k·D per round, broadcast centroids),
    # in-plan PII scrub / WET extraction (pure-projection, row-bound),
    # largest-remainder mixture sampling (dimension-sized allocation +
    # salted per-source top-k)
    "ngram_repetition",
    "sentence_dedup_global",
    "kmeans_embedding_clusters",
    "pii_scrub_stats",
    "html_extract_stats",
    "mixture_stratified_sample",
    # round-5 wave-3: per-source boilerplate frequency strip, BM25
    # keyword ranking (IN-list pruned tf + salted top-k), logistic
    # quality features (two partial-agg shuffles), URL canonicalization
    # (pure projection)
    "boilerplate_strip",
    "bm25_topk",
    "quality_logistic_filter",
    "url_normalize_stats",
    # round-5 wave-4: corpus Zipf fit (vocab-bound), content-addressed
    # dropout + positional span corruption (token-stream rebuilds)
    "zipf_fit_stats",
    "augment_word_dropout",
    "span_corruption_pairs",
    "url_dedup_domains",
    "dedup_weighted_sampling",
    "knn_label_spread",
    "bigram_logprob_quality",
    "label_silhouette_lite",
    # round-6 wave: fixed-256-bucket importance weights (the dimension
    # never grows), sample-trained per-lang ppl terciles, source
    # keyword extraction, int8 audit (projection-only)
    "dsir_importance_weights",
    "ccnet_ppl_buckets",
    "ctfidf_source_keywords",
    "int8_quant_audit",
    "pca_power_iteration",
    "semantic_decontaminate",
    "mad_outlier_docs",
    "lsh_recall_audit",
    "code_detect_stats",
    "packing_efficiency_audit",
    "tokenizer_fertility_by_lang",
    "k_anonymity_audit",
    "ks_drift_audit",
    "containment_pairs",
    "corpus_prep_funnel_v2",
    # round-7 wave: Gopher rule composite (projection+doc-keyed aggs),
    # sampled banding audit (25% hash-sample of both generators),
    # re-fit-per-stage funnel (sequential refits over shrinking
    # corpora), temperature/domain reweighting (dimension-sized aggs
    # over corpus-sized score relations), matryoshka truncation audit
    # (probes broadcast x 4 dims), l-diversity (QI-dimension agg),
    # proximity top-k (posting-pruned doc-keyed pair join), RRF
    # ensemble (three signal chains + histogram ranks)
    "gopher_quality_gate",
    "lsh_recall_audit_sampled",
    "corpus_prep_funnel_v3",
    "lang_temperature_sampling",
    "domain_mixture_reweight",
    "matryoshka_truncation_audit",
    "l_diversity_audit",
    "proximity_search_topk",
    "quality_ensemble_rank",
    "lsh_scurve_calibration",
    "length_percentiles_by_source",
    "decontamination_method_agreement",
    # round-7 wave 2: PSI/JSD drift (bounded bucket/vocab grids over
    # one-pass keyed aggs), bounded-reference kNN outliers (256
    # broadcast dots per row), script-mixture + C4 line filters (pure
    # projections + keyed aggs), Heaps fit (two token-stream groupBys,
    # 10-row windows)
    "psi_drift_audit",
    "js_divergence_sources",
    "embedding_outlier_knn",
    "script_mixture_audit",
    "c4_line_filters",
    "heaps_law_fit",
    # round-7 wave 3: vocab-bound burstiness ranking, 64-key shard
    # assignment audit (the writer's own shuffle)
    "token_burstiness_topk",
    "shard_assignment_stats",
    # round-7 flagship: seven-audit release card (each leg its own
    # documented bounded plan; the composite is their sum)
    "corpus_release_report",
    # round-7 wave 6: epoch plan (source-dimension aggs), snapshot
    # resemblance sketch (one pass, 16 map-side MINs; exact audit ride)
    "epoch_sampling_plan",
    "corpus_resemblance_sketch",
    # round-7 end-to-end flagship: funnel -> dedup-keep -> shard
    "curated_shard_manifest",
    # governance trio completion: DP Laplace count release (QI-dim agg)
    "dp_laplace_release",
    # cross-source score calibration (score-cardinality-bounded windows)
    "quality_score_quantile_norm",
    # per-gate ablation attribution (7 keep-set joins on one fenced spine)
    "gate_attribution_audit",
    # per-(gate, lang) filter-bias audit (same fenced spine, dim rollup)
    "gate_bias_audit",
    # greedy k-center coreset (8 map passes + 1-row argmax per round)
    "kcenter_coreset_selection",
    # dedup report: cluster-size power-law table over the CC membership
    "dup_cluster_size_histogram",
    # round-7 wave 7: map-only readability gate, cross-source dup
    # matrix (count products over per-(cluster, source) counts), IVF
    # recall audit (quantizer rebuild + nprobe/k candidate volume),
    # skew planner (one keyed agg per relation; only the documents leg
    # scales — events/lineitem/orders ride unscaled symlinks)
    "readability_flesch_gate",
    "cross_source_dup_matrix",
    "ann_ivf_recall_audit",
    "join_skew_audit",
    # ranking-quality audit: 10-row judged list + posting-bounded
    # relevance relation on top of the registered bm25 leg
    "retrieval_ndcg_audit",
    # fixed-48-clip audio fingerprint dedup (decode cost is the floor)
    "audio_envelope_dedup",
    # classifier PR sweep: two bounded gate plans + 9-row dimension agg
    "quality_pr_curve",
    # one prefix-filtered pair generation + threshold-dimension rollup
    "dedup_threshold_sweep",
    # lang_quality's token pass + |langs|^2 rollup
    "langid_confusion_matrix",
    # 32-byte fingerprint diff join + |sources| rollup
    "snapshot_diff_report",
    # round-8 training tier: GD chain = rounds x (broadcast-weight
    # scoring pass + 9-number reduce) over the narrow feature relation;
    # the holdout/disagreement/importance legs add one bounded pass each
    "quality_classifier_train",
    "quality_classifier_publish",
    "quality_pr_curve_trained",
    "quality_classifier_holdout",
    "quality_label_disagreement",
    "quality_feature_importance",
    # round-8 wave 3: rounds x scoring passes + doc-keyed moment agg
    # (data map); one fenced 3-signal spine -> 3 count rows (kappa);
    # one scoring pass + <=10-bin agg (calibration)
    "training_data_map",
    "gate_agreement_kappa",
    "quality_calibration_curve",
    # round-8 wave 4: (QI x lang) dimension grid (t-closeness); 32-way
    # dimension explode collapsed map-side into 32 confusion rows
    "t_closeness_audit",
    "quality_f1_bootstrap",
    # round-8 flagship: v2's gate chain + the GD chain, one swap
    "corpus_prep_funnel_v4",
    # score-histogram window + 4-row dimension join
    "quality_budget_threshold",
    "dedup_quality_interaction",
    # round 9: committed-artifact consumers (selection + data card v2
    # + per-source token-cost accounting off the committed vocab)
    "active_learning_batch",
    "corpus_release_report_v2",
    "bpe_vocab_publish",
    "tokenizer_cost_report",
    "token_mixture_plan",
    # round 10: release pin write path (first run pays the once-per-
    # corpus-version artifact builds — the rebuilt flag says so; warm
    # runs are three pinned dimension-sized scans + one pointer read)
    "corpus_release_manifest",
    # delta funnel at parity convention (processes half the corpus by
    # definition — the delta-∝-delta-size story is funnel_delta_probe's
    # fixed-delta rows; this row tracks the oracled query itself)
    "corpus_prep_funnel_incremental",
]
# zorder_pruning_audit reads orders (unscaled symlink at Rx) — probed
# ad hoc against real SF dirs instead.


# Bumped whenever the corpus generator below changes shape (salting
# rule, feature tail, embedding jitter). Stamped into OUT at build time
# so SPARK_GRAFT_SCALE_REUSE=1 can never silently benchmark a corpus
# left over from an OLDER generator as if it were current (ADVICE r9).
GEN_VERSION = "salt-v2+feature-tail-v1"


def _marker_path() -> str:
    return os.path.join(OUT, "_generator.json")


def build(spark) -> None:
    # SPARK_GRAFT_SCALE_REUSE=1 keeps an existing Rx corpus (e.g. the
    # CC executor-count sweep times the same data at 8/16/32 threads) —
    # but only one stamped by THIS generator version; stale markers
    # force a rebuild instead of mis-measuring old data.
    if os.path.isdir(OUT):
        if os.environ.get("SPARK_GRAFT_SCALE_REUSE") == "1":
            try:
                with open(_marker_path()) as f:
                    marker = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                marker = None
            if marker and marker.get("version") == GEN_VERSION and marker.get("base") == BASE:
                return
            print(
                f"# reuse refused: {OUT} built by "
                f"{marker and marker.get('version')!r}, current generator "
                f"is {GEN_VERSION!r} — rebuilding",
                file=sys.stderr,
            )
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    docs = q.load(spark, BASE, "documents")
    emb = q.load(spark, BASE, "embeddings")
    # 10x embeddings: vec_id offset + per-replica deterministic jitter so
    # replicas aren't exact copies (cosine structure preserved)
    eb = None
    for r in range(R):
        rep = emb.select(
            (F.col("vec_id") + F.lit(r * 100_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda v: (v * (1.0 + r * 1e-3)).cast("float")
            ).alias("embedding"),
            "label",
        )
        eb = rep if eb is None else eb.unionByName(rep)
    eb.repartition(32).write.parquet(f"{OUT}/embeddings.parquet")
    # salt every token EXCEPT bm25_topk's fixed query terms: replica-0
    # salting used to rename 'table'->'tablex0' too, emptying the BM25
    # IN-list so its 10x/30x rows measured only the scan (rowsR: 0,
    # VERDICT r5 Next #4). Keeping the three query terms unsalted
    # exercises the posting join + per-doc accumulation + salted top-k
    # at scale; shared isolated unigrams add no cross-replica shingles
    # (a shared trigram would need 3 consecutive unsalted tokens).
    _keep = r"(?!(?:table|scan|merge)(?!\S))"
    # FEATURE-perturbing tail (VERDICT r8 next-item #4): salting alone
    # renames tokens bijectively, so the quality features (stopword
    # density, length, top-token share) collapse to near-constants and
    # the trained-vs-gate audits degenerate (0 disagreements, 1
    # calibration bin) at 10x/30x. Appending a deterministic per-(doc,
    # replica) amount of REAL stopwords interleaved with salted filler
    # shifts f_stop/f_len/f_top continuously — and never creates a
    # cross-replica shared shingle (no 3 consecutive unsalted tokens:
    # every other appended token carries the replica suffix).
    def _tail(r: int):
        unit = f" the fillx{r} of fillx{r} a fillx{r}"
        return F.expr(
            f"repeat('{unit}', CAST(pmod(doc_id * 31 + {r}, 5) AS INT))"
        )

    reps = [
        docs.select(
            (F.col("doc_id") + F.lit(r * 100_000_000)).alias("doc_id"),
            F.concat(
                F.regexp_replace(
                    "text", r"(?<!\S)" + _keep + r"(\S+)", f"$1x{r}"
                ),
                _tail(r),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        for r in range(R)
    ]
    big = reps[0]
    for rep in reps[1:]:
        big = big.unionByName(rep)
    big.repartition(32).write.parquet(f"{OUT}/documents.parquet")
    # unscaled fact/dim tables: symlink so load() finds them if needed
    for t in ["events", "lineitem", "orders"]:
        os.symlink(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")
    with open(_marker_path(), "w") as f:
        json.dump({"version": GEN_VERSION, "R": R, "base": BASE}, f)


def _registry_state() -> dict:
    """{artifact-table-path: current snapshot version} for every table
    under the committed-artifact registry — compared before/after each
    probed op so the JSON records whether THAT op's timing includes a
    once-per-corpus-version artifact rebuild (VERDICT r9 What's-wrong
    #1: first-consumer-pays-the-rebuild spikes are build cost, not scan
    cost, and the table should say which is which)."""
    from etl_weather_spark.operators.artifacts import artifacts_root
    from etl_weather_spark.sources.snapshots import current_version

    root = artifacts_root()
    state = {}
    if not os.path.isdir(root):
        return state
    for dirpath, dirs, files in os.walk(root):
        if "_latest" in files:
            state[os.path.relpath(dirpath, root)] = current_version(dirpath)
            dirs[:] = []
    return state


def main() -> None:
    spark = get_spark(app_name="bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    q.load(spark, BASE, "documents").count()  # warm
    results = {}
    for name in OPS:
        if ONLY is not None and name not in ONLY:
            continue
        fn = q._QUERIES[name]
        t = []
        rows = []
        rebuilt = False
        for d in (BASE, OUT):
            samples = []
            for _ in range(2):
                pre = _registry_state()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                samples.append(time.perf_counter() - t0)
                if _registry_state() != pre:
                    rebuilt = True  # this sample paid an artifact build
            t.append(min(samples))
            rows.append(n)
        results[name] = {
            "t1": round(t[0], 2), "tR": round(t[1], 2),
            "ratio": round(t[1] / t[0], 1),
            "rows1": rows[0], "rowsR": rows[1],
            "rebuilt": rebuilt,
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)
    print(json.dumps({"R": R, "ops": results}))


if __name__ == "__main__":
    main()
