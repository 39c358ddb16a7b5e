#!/usr/bin/env python
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR and
print ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a count-style action that cannot be
optimized into metadata-only (collect on the final plan). Timings are
per-query wall clock after a shared warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

from etl_weather_spark import queries as q
from etl_weather_spark.session import get_spark

#: queries timed by the bench — the headline set covering scan/agg,
#: shuffle join, broadcast star join, window, as-of, text, top-k.
HEADLINE = [
    "daily_flags",
    "hourly_outer_join",
    "rolling_avg_7d",
    "rank_pct_diff",
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
    "asof_join",
    "doc_stats",
    "dedup_exact",
    # second wave: semi-join, band join, sessionization, pivot,
    # pushdown filter-agg, left-join histogram
    "forecast_revenue",
    "priority_order_counts",
    "error_after_click",
    "user_sessions",
    "pivot_event_values",
    "customer_order_distribution",
    # dedup-at-scale production paths (xxhash64 LSH, rolling-hash winnow)
    "minhash_lsh_fast",
    "winnow_candidates",
    # third wave: rank-1 window over broadcast star (Q2-shaped), 5-way
    # join profit rollup (Q9-shaped)
    "cheapest_supplier",
    "nation_profit",
    # fourth wave: grouping-sets rank window, broadcast shingle
    # decontamination, shuffle-free regex scrub
    "rollup_rank",
    "decontaminate_overlap",
    "redact_terms",
    # fifth wave: two-level token agg (repetition quality pre-filter)
    "token_repetition",
    # sixth wave (round 2): track the structural outliers, not just the
    # easy queries — iterative connected components over dup pairs
    "dedup_clusters",
    # seventh wave (round 2): incremental corpus screen (cross-side LSH +
    # exact verify), two-level global prefix-sum packing, mergeable-HLL
    # weekly rollup
    "incremental_index_dedup",
    "token_budget_batches",
    "sketch_rollup_weekly_users",
    # eighth wave (round 2): iterative graph rounds over the dup-pair
    # graph; two-pass MG heavy hitters (map-side candidates + exact
    # broadcast recount)
    "doc_pagerank",
    "heavy_hitter_users",
    # ninth wave (round 2): embedding-graph semantic dedup, Bloom-screen
    # incremental dedup, PQ compressed-ANN with exact re-rank
    "semantic_dedup",
    "bloom_screen_new_docs",
    "ann_cosine_pq",
    # tenth wave (round 2): leakage-safe split, contrastive hard
    # negatives, CMS frequency sketch
    "cluster_safe_split",
    "hard_negatives",
    "cms_user_freq",
    # eleventh wave (round 3): data-adaptive IVF-cell semantic dedup
    # (replaces the fixed-label block's quadratic term), PPJoin
    # prefix-filter exact Jaccard (the generator the cluster pipelines
    # now compose)
    "semantic_dedup_ivf",
    "prefix_filter_jaccard",
    # twelfth wave (round 3): corpus-LM perplexity-proxy scoring
    # (vocabulary-sized join + decimal-exact accumulation), weekly
    # cohort-retention triangle (two hash aggs + broadcast sizes join)
    "unigram_logprob_quality",
    "cohort_retention",
    # Q21-shaped correlated EXISTS/NOT-EXISTS as one pass of semi/anti
    # hash joins (plan-tested)
    "waiting_suppliers_blame",
    # node-ordered wedge-join triangle audit over the dup-pair graph
    "dup_cluster_transitivity",
    # thirteenth wave (round 4): Lee-et-al exact-substring spans
    # (hash-bucketed shingle-run merging, no suffix array) and the real
    # stdlib PNG decode path (encode -> zlib -> unfilter -> stats)
    "exact_substring_spans",
    "media_pixel_stats",
    # Manku-style simhash banding pair detection (64 bit-votes + band
    # equi-join + hamming verify)
    "simhash_near_dupes",
    # fourteenth wave (round 4): RRF hybrid retrieval fusion and
    # 3-round distributed BPE tokenizer training (vocab-level pair
    # counts + lazy broadcast merge rounds, all-Catalyst fold)
    "hybrid_search_rrf",
    "bpe_merge_rounds",
    "bpe_encode_stats",
    # perceptual image dedup: real PNG decode -> dHash -> Manku banding
    "image_dhash_dedup",
    # fifteenth wave (round 5): fractional-ratio media conform (area
    # resize to a fixed target; linear resample to a fixed rate) on the
    # real codec path; rank-based tokenizer-apply encode (the
    # production BPE encode, cross-checked against the fold replay)
    "media_area_resize_stats",
    "media_resample_stats",
    "bpe_ranked_encode_stats",
    # persisted-PQ-index retrieval roundtrip (standing-artifact serving)
    "ann_pq_index_roundtrip",
    # WET-style web-text extraction (pure-Catalyst regex chain)
    "html_extract_stats",
    # mixture-weight EXECUTION (largest-remainder stratified sample) and
    # PII-class scrub, both content-addressed/deterministic
    "mixture_stratified_sample",
    "pii_scrub_stats",
    # Gopher n-gram repetition gate (dup-bigram/trigram char coverage)
    "ngram_repetition",
    # distributed Lloyd k-means (iterative numeric fixpoint, 3 rounds)
    "kmeans_embedding_clusters",
    # C4-style global sentence dedup with per-doc text rebuild
    "sentence_dedup_global",
    # CCNet-style per-source boilerplate strip (seeded headers)
    "boilerplate_strip",
    # Okapi BM25 keyword retrieval (salted top-20)
    "bm25_topk",
    # model-based quality filter (fixed-weight logistic, logit scale)
    "quality_logistic_filter",
    # URL canonicalization (pure-projection regex chain)
    "url_normalize_stats",
    # URL-level exact dedup + per-domain rollup with blocklist flag
    "url_dedup_domains",
    # Zipf-law corpus diagnostic (quantized log-log least squares)
    "zipf_fit_stats",
    # training-objective prep: content-addressed word dropout and
    # T5-style span corruption (input, target) pairs
    "augment_word_dropout",
    "span_corruption_pairs",
    # soft dedup: duplication-discounted sampling weights
    "dedup_weighted_sampling",
    # semi-supervised kNN label spreading + confusion rollup
    "knn_label_spread",
    # corpus bigram-LM perplexity proxy (context-aware quality)
    "bigram_logprob_quality",
    # embedding label-quality audit (centroid silhouette)
    "label_silhouette_lite",
    # text/vector store join-health audit
    "embedding_coverage_audit",
    # PMI collocation extraction (multiword-expression mining)
    "collocation_pmi_topk",
    # cross-language vocabulary overlap audit
    "lang_vocab_overlap",
    # language-ID confidence margins (CCNet-style keep gate)
    "lang_id_confidence",
    # round-6: real baseline-JPEG decode path (huffman + IDCT inside
    # mapInPandas — the dominant real-crawl image format)
    "media_jpeg_stats",
    # round-6 wave: DSIR hashed-bigram importance weights (256-bucket
    # broadcast dimension), CCNet per-lang perplexity terciles
    # (sample-trained boundaries), c-TF-IDF source keywords (salted
    # per-source top-5), int8 quantization audit (pure projection)
    "dsir_importance_weights",
    "ccnet_ppl_buckets",
    "ctfidf_source_keywords",
    "int8_quant_audit",
    # distributed power iteration (iterative numeric fixpoint #2)
    "pca_power_iteration",
    # semantic decontamination (broadcast eval set x corpus scan) and
    # histogram-median MAD outlier gate (no per-source sort)
    "semantic_decontaminate",
    "mad_outlier_docs",
    # LSH approximation-quality audit (two oracled generators composed),
    # code-vs-prose routing signal, batch-packing fill-rate audit
    "lsh_recall_audit",
    "code_detect_stats",
    "packing_efficiency_audit",
    # multilingual tokenizer-equity audit on the BPE encode path
    "tokenizer_fertility_by_lang",
    # governance + monitoring: k-anonymity classes, KS distribution drift
    "k_anonymity_audit",
    "ks_drift_audit",
    # asymmetric containment join (prefix-filtered probe x full index)
    "containment_pairs",
    # the modern curation funnel: six round-5/6 gates composed, per-stage
    # survivor checksums verified end to end
    "corpus_prep_funnel_v2",
    # round-7 wave: the full Gopher rule composite (published Table-A1
    # constants, integer-exact keep logic), the bounded-sample banding
    # audit (the priciest row's production shape — 25% hash-sample,
    # ~6% of the pair work), and the re-fit-per-stage funnel (each
    # gate's statistics fit on the prior stage's survivors)
    "gopher_quality_gate",
    "lsh_recall_audit_sampled",
    "corpus_prep_funnel_v3",
    # round-7 wave 2: temperature/domain reweighting, truncation and
    # governance audits, proximity retrieval, RRF ensemble, banding
    # s-curve calibration, exact histogram percentiles
    "lang_temperature_sampling",
    "domain_mixture_reweight",
    "matryoshka_truncation_audit",
    "l_diversity_audit",
    "proximity_search_topk",
    "quality_ensemble_rank",
    "lsh_scurve_calibration",
    "length_percentiles_by_source",
    # decontamination screens cross-tabulated (both registered legs
    # reused verbatim; the semantic-only cell quantifies paraphrase
    # leakage the shingle screen structurally misses)
    "decontamination_method_agreement",
    # round-7 wave 3: distribution drift (PSI integrates the shift KS
    # maxes), source-vs-corpus JS divergence, bounded-reference kNN
    # embedding outliers, script-mixture spam signal, C4 line filters,
    # Heaps vocabulary-growth fit
    "psi_drift_audit",
    "js_divergence_sources",
    "embedding_outlier_knn",
    "script_mixture_audit",
    "c4_line_filters",
    "heaps_law_fit",
    # round-7 wave 4: boilerplate burstiness ranking, content-addressed
    # output-shard balance audit
    "token_burstiness_topk",
    "shard_assignment_stats",
    # round-7 wave 5 flagship: the release-governance data card
    # composing seven registered audits
    "corpus_release_report",
    # round-7 wave 6: data-constrained epoch plan, snapshot
    # resemblance sketch with in-plan exact audit
    "epoch_sampling_plan",
    "corpus_resemblance_sketch",
    # round-7 end-to-end flagship: the whole prep pipeline in one plan
    # (funnel gates -> exact-dedup keepers -> shard manifest)
    "curated_shard_manifest",
    # DP Laplace count release (governance trio with k-anon/l-div)
    "dp_laplace_release",
    # quantile normalization of quality scores across sources
    "quality_score_quantile_norm",
    # per-gate unique-kill attribution (the filter ablation table)
    "gate_attribution_audit",
    # per-(gate, lang) keep-rate disparity (the filter-bias audit)
    "gate_bias_audit",
    # greedy farthest-point coreset selection (iterative fixpoint #4)
    "kcenter_coreset_selection",
    # near-dup cluster-size distribution (the dedup paper's table 1)
    "dup_cluster_size_histogram",
    # round-7 wave 7: pre-shuffle skew planner (one keyed agg per
    # audited relation), map-only readability gate, cross-source
    # duplication matrix (count products, never pair enumeration),
    # fully hash-verified IVF recall@10 audit (kmeans quantizer reused)
    "join_skew_audit",
    "readability_flesch_gate",
    "cross_source_dup_matrix",
    "ann_ivf_recall_audit",
    # nDCG/MRR/precision-recall audit of the registered BM25 ranking
    "retrieval_ndcg_audit",
    # audio near-dup screen on the real WAV codec path (envelope hash)
    "audio_envelope_dedup",
    # zone-map pruning: Z-order vs date-linear layout for a 2-D box
    "zorder_pruning_audit",
    # classifier PR curve vs the Gopher rule gate as weak labels
    "quality_pr_curve",
    # dedup threshold-sensitivity curve (one generation, 5-point sweep)
    "dedup_threshold_sweep",
    # lang-ID confusion matrix vs stored labels (multiclass eval leg)
    "langid_confusion_matrix",
    # exact per-source snapshot diff (the sketch's drill-down)
    "snapshot_diff_report",
    # round-8 training tier: distributed-GD classifier (8 broadcast-
    # weight passes + tiny reduces), trained-vs-fixed PR comparison,
    # held-out generalization sweep, disagreement review queue,
    # standardized-coefficient importance
    "quality_classifier_train",
    "quality_pr_curve_trained",
    "quality_classifier_holdout",
    "quality_label_disagreement",
    "quality_feature_importance",
    # round-8 wave 3: training dynamics + agreement/calibration
    "training_data_map",
    "gate_agreement_kappa",
    "quality_calibration_curve",
    # round-8 wave 4: governance ladder top rung + eval uncertainty
    "t_closeness_audit",
    "quality_f1_bootstrap",
    # round-8 flagship: the funnel with the trained quality gate
    "corpus_prep_funnel_v4",
    # budget-targeted quality thresholds (histogram-rank, sortless)
    "quality_budget_threshold",
    # dedup-band x quality interaction (committed CC membership +
    # committed weights — two registry scans + one scoring pass)
    "dedup_quality_interaction",
    # round 9: the committed-model registry write path (trains the GD
    # chain once per corpus version, commits trajectory + weights; all
    # trainer audits above read the committed artifacts)
    "quality_classifier_publish",
    # uncertainty x diversity annotation-batch selector (top-40 |z|
    # shortlist + greedy k-center over the feature space, both on
    # committed artifacts)
    "active_learning_batch",
    # the data card with the trained-model tier (v1's seven governance
    # scalars + trained keep/F1, ECE, t-closeness, near-dup share)
    "corpus_release_report_v2",
    # tokenizer registry: publish (warm read after first train+commit)
    # and per-source token-cost accounting off the committed vocab
    "bpe_vocab_publish",
    "tokenizer_cost_report",
    # temperature mixture over TOKEN shares (corpus -> committed vocab
    # -> token accounting -> mixture plan, hash-verified end to end)
    "token_mixture_plan",
    # round 10: the atomic release pin's write path (ensure three
    # artifacts + one catalog pin commit + strict pinned re-reads)
    "corpus_release_manifest",
    # the delta funnel: streaming per-doc gate chain + first-arrival
    # dedup against the standing half, as one oracled batch relation
    "corpus_prep_funnel_incremental",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-weather-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    # warm-up: JVM + parquet footer reads, not counted
    registry["daily_agg"](spark, sf_dir).collect()
    # warm-up 2: spin up the Python worker pool + Arrow serializers so
    # pandas-UDF queries measure their own work, not the one-time
    # 32-worker fork/import cost (~3-6 s). Runs a synthetic range — no
    # benchmark query or its input is touched, so nothing is pre-cached.
    import pandas as pd  # noqa: PLC0415 — bench-only import
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _warm_fn(x):
        import numpy as np  # noqa: F401,PLC0415 — preload in workers

        return pd.Series([[int(v)] for v in x])

    _warm = pandas_udf(_warm_fn, "array<long>")
    spark.range(0, 64, 1, 64).select(F.explode(_warm("id"))).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        # two full executions, report the MIN: the registry queries hold
        # no state between runs (no persisted intermediates since the
        # single-consumer verify rewrite), so run 2 re-executes the
        # whole plan — the min is the same work measured with less
        # scheduler/CPU contention from co-tenant load (observed ±3x
        # single-shot swings on an otherwise idle repo). Both samples
        # print to stderr so the spread stays visible.
        samples = []
        while True:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink computes every output column (count() would let
            # Catalyst prune projection-only plans down to a row count)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            best = sorted(samples)[:2]
            if len(samples) >= 2 and (
                len(samples) >= 4
                or (best[1] < 2 * best[0] and best[0] < 3.0)
            ):
                break
            # keep sampling (to 4) while the two best disagree by >2x OR
            # the best is >3s — a co-tenant noise window can outlast two
            # back-to-back samples, so "two agreeing slow samples" alone
            # is not evidence the plan is slow (observed: the same
            # winnow plan 11.2s/10.97s during a load spike, 1.4s after)
        timings[name] = min(samples)
        print(f"# {name}: {timings[name]:.3f}s (samples: {samples})", file=sys.stderr)

    streaming_rate = _streaming_windowed_rate(spark)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query map: bench_out.json (committed artifact) + stderr.
    # The final stdout line stays COMPACT (worst-5 only) because the
    # driver's tail capture keeps ~2,000 chars — the full 75-query map
    # blew past that in round 5 and the bench artifact parsed as null.
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "streaming_windowed_rows_per_sec": streaming_rate,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(f"# full per-query map: {json.dumps(timings, sort_keys=True)}", file=sys.stderr)
    print(json.dumps(compact_line(timings, sf_val, streaming_rate)))
    spark.stop()


#: hard budget for the final stdout JSON line — the driver keeps only
#: the last ~2,000 chars of output, so the line must stay well under
#: that forever regardless of how many queries the headline set grows.
COMPACT_LINE_BUDGET = 1500


def compact_line(timings: dict, sf, streaming_rate: int) -> dict:
    """One driver-parseable summary line: total + worst-5 per-query map.

    The full map lives in bench_out.json / stderr; ``queries`` here is
    capped at the 5 slowest so the serialized line never approaches the
    driver's 2,000-char tail window (asserted < COMPACT_LINE_BUDGET by
    tests/test_bench_line.py even at 500 registered queries).
    """
    worst5 = dict(sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    return {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": worst5,
        "n_queries": len(timings),
        "queries_full": "bench_out.json",
        "sf": sf,
        # tracked separately (rows/sec, not seconds — never added into
        # the headline total): watermarked tumbling-window agg over the
        # rate source, Spark's own processedRowsPerSecond measurement.
        # Full methodology + stateless ceiling: scripts/bench_streaming.py
        "streaming_windowed_rows_per_sec": streaming_rate,
    }


def _streaming_windowed_rate(spark, rows_per_sec: int = 500_000, seconds: int = 8) -> int:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_weather_spark.functions.rounding import dsum

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1000).alias("user_id"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )
    agg = (
        events.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute").alias("win"), "user_id")
        .agg(dsum("value").alias("vsum"), F.count(F.lit(1)).alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
    query = (
        agg.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        # fixed 2s trigger interval: batches processing <2s leave a
        # genuine idle gap, so the shutdown below can stop between
        # triggers instead of aborting an in-flight micro-batch (a
        # continuous trigger re-fires immediately and there is no
        # clean window)
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        # wait for enough micro-batches that skipping cold-start ones
        # still leaves a measurement (first batches can take seconds
        # right after the heavy batch queries)
        deadline = time.monotonic() + max(seconds, 30)
        while time.monotonic() < deadline and len(query.recentProgress) < 5:
            time.sleep(1)
        progresses = [json.loads(p.json) for p in query.recentProgress]
    finally:
        # stop in a trigger-idle window so no DataWritingSparkTask is
        # aborted mid-state-store-commit, then wait for full thread
        # termination BEFORE deleting the checkpoint (stop + immediate
        # rmtree raced a committing batch and left an ERROR stack in
        # the round-3 bench tail). NOTE: processAllAvailable() is NOT
        # usable here — against an unbounded rate source it chases the
        # ever-advancing offsets and can block forever.
        idle_deadline = time.monotonic() + 15
        while time.monotonic() < idle_deadline:
            try:
                if not query.status.get("isTriggerActive", False):
                    break
            except Exception:  # noqa: BLE001
                break
            time.sleep(0.05)
        query.stop()
        try:
            query.awaitTermination(30)
        except Exception:  # noqa: BLE001
            pass
        shutil.rmtree(ckpt, ignore_errors=True)
    rates = [
        p["processedRowsPerSecond"]
        for p in progresses[2:]  # skip cold-start micro-batches
        if p.get("numInputRows", 0) > 0 and "processedRowsPerSecond" in p
    ]
    return round(sum(rates) / len(rates)) if rates else 0


if __name__ == "__main__":
    main()
