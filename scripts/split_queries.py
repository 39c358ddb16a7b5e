"""One-shot refactoring tool: split the monolithic etl_weather_spark/queries.py
into a package of domain modules with an unchanged public surface.

Mechanics (AST-driven, no semantic edits):
- segment the file into top-level units (defs/assigns + their leading
  comment block);
- assign each unit a NATURAL domain (query-name keyword rules + a
  manual override table);
- compute the name-dependency graph between units and bump every unit
  to max(natural, deps' modules) until fixpoint, so no module ever
  imports from a later one (import-time AND call-time references both
  resolve through top-of-module imports);
- emit `etl_weather_spark/queries/<module>.py` files in original
  source order within each module, with auto-generated cross-module
  imports, plus an `__init__.py` that hoists every top-level name so
  `etl_weather_spark.queries.<anything>` keeps working (tests,
  streaming, cli, serve, __spark_entry__ all import through it).

Run from the repo root:  python scripts/split_queries.py [--dry-run]
"""

from __future__ import annotations

import ast
import os
import sys
from collections import defaultdict

SRC = "etl_weather_spark/queries.py"
PKG = "etl_weather_spark/queries"

MODULES = [
    "_registry",   # decorator, load(), _PRIORITY, queries()/oracle_sql()
    "relational",  # TPC-shaped joins/aggs/windows + events/weather spine
    "text",        # tokenization, quality scores, language, BPE, retrieval
    "dedup",       # fingerprints, shingles, MinHash/SimHash/LSH, CC, snapshots
    "similarity",  # embeddings: ANN, kmeans, kNN, PCA, semantic dedup
    "media",       # binary codecs: PNG/JPEG/WAV stats, dHash, audio envelope
    "governance",  # PII, k-anon, l-div, t-closeness, DP, release reports
    "sampling",    # mixtures, splits, packing, shards, curriculum, budgets
    "training",    # trained quality classifier tier + funnels + gate audits
]

MODULE_DOC = {
    "_registry": "Registry core: the @query decorator, the shared "
    "_QUERIES/_ORACLES dicts, table loading, and the driver-prefix "
    "ordering contract (_PRIORITY).",
    "relational": "Relational tier: TPC-shaped join/agg/window queries "
    "over the star schema plus the events-table weather-spine parity "
    "rows (SURVEY.md §2 P/F/J/A/W/O/U/C/V families).",
    "text": "Text-analysis tier: tokenization, quality scoring, "
    "language ID, BPE training/encoding, retrieval (BM25/RRF/nDCG), "
    "and corpus statistics over the documents table.",
    "dedup": "Deduplication tier: exact/near-dup fingerprints, "
    "MinHash/SimHash/LSH candidate generation, prefix-filter Jaccard, "
    "connected components, snapshot diff/resemblance.",
    "similarity": "Embedding-similarity tier: ANN "
    "(brute/LSH/IVF/PQ), kmeans, kNN audits, PCA, semantic dedup and "
    "decontamination over the embeddings table.",
    "media": "Multimodal tier: real PNG/JPEG/WAV decode statistics, "
    "perceptual dHash dedup, audio-envelope fingerprints over binary "
    "payload columns.",
    "governance": "Governance tier: PII scrubbing stats, k-anonymity, "
    "l-diversity, t-closeness, DP releases, and corpus release "
    "reporting.",
    "sampling": "Mixture/sampling tier: temperature and DoReMi-style "
    "mixtures, train/test splits, token-budget packing, shard "
    "manifests, curricula.",
    "training": "Trained-classifier tier: distributed batch-GD "
    "training, the committed-model registry wiring, trained-vs-fixed "
    "audits, curation funnels, and training-dynamics analytics.",
}

# name -> module for everything the keyword rules get wrong or cannot
# see (helpers inherit from consumers via the dependency fixpoint, so
# only genuinely ambiguous units need rows here).
OVERRIDES = {
    # weather/events spine + serving parity stay relational
    "word_freq": "text",
    "udtf_melt_events": "relational",
    "redact_terms": "governance",
    "pii_scrub_stats": "governance",
    "k_anonymity_audit": "governance",
    "l_diversity_audit": "governance",
    "dp_laplace_release": "governance",
    "t_closeness_audit": "governance",
    "corpus_release_report": "governance",
    "data_card": "governance",
    # sampling tier
    "mixture_temperature_weights": "sampling",
    "mixture_stratified_sample": "sampling",
    "lang_temperature_sampling": "sampling",
    "domain_mixture_reweight": "sampling",
    "source_mix_rebalance": "sampling",
    "epoch_sampling_plan": "sampling",
    "train_test_split": "sampling",
    "cluster_safe_split": "sampling",
    "token_budget_batches": "sampling",
    "packing_efficiency_audit": "sampling",
    "per_source_quota": "sampling",
    "shard_assignment_stats": "sampling",
    "stratified_sample_counts": "sampling",
    "weighted_sample_topk": "sampling",
    "dedup_weighted_sampling": "sampling",
    "curriculum_quality_order": "sampling",
    "token_dropout_augment": "sampling",
    "augment_word_dropout": "sampling",
    "span_corruption_pairs": "sampling",
    "curated_shard_manifest": "training",
    "doc_chunks": "sampling",
    "train_eval_decontaminate": "sampling",
    # committed CC membership is a dedup-domain artifact (its training-
    # tier consumers import it forward)
    "_cc_membership_committed": "dedup",
    # the PR-sweep helpers are only consumed by the trained tier
    "_pr_sweep_spark": "training",
    "_PR_SWEEP_SQL_TAIL": "training",
    "_PR_THRESHOLDS": "training",
}

KEYWORD_RULES = [
    # (module, substrings matched against the unit's primary name)
    ("media", ("media_", "png_", "image_", "audio_", "jpeg")),
    ("training", (
        "quality_classifier", "qct", "training_data_map", "gate_",
        "quality_pr_curve", "quality_calibration", "quality_f1",
        "quality_feature_importance", "quality_label",
        "quality_budget", "corpus_prep_funnel", "funnel_v",
        "dedup_quality_interaction", "quality_ensemble", "kappa",
    )),
    ("similarity", (
        "ann_", "embedding", "semantic_", "kmeans", "knn_", "_knn",
        "pca_", "kcenter", "matryoshka", "hard_negatives",
        "label_centroid", "label_silhouette", "nearest_hub",
        "int8_quant", "ivf", "_pq_",
    )),
    ("dedup", (
        "dedup", "minhash", "simhash", "shingle", "jaccard",
        "containment", "exact_substring", "sentence_dedup", "winnow",
        "lsh_", "_lsh", "dup_", "_dup", "bloom_screen", "snapshot_",
        "resemblance", "decontaminat", "url_normalize", "url_dedup",
        "fuzzy_", "similar_nation", "pagerank", "canonicals",
        "scurve",
    )),
    ("text", (
        "doc_stats", "lang_", "token_", "_token", "vocab", "bpe_",
        "_bpe", "unigram", "bigram", "tfidf", "zipf", "boilerplate",
        "ngram", "readability", "flesch", "html_extract", "keyword",
        "bm25", "hybrid_search", "proximity_search", "retrieval",
        "ndcg", "c4_line", "heaps_law", "ccnet", "dsir", "ctfidf",
        "langid", "script_mixture", "code_detect", "collocation",
        "word_", "quality_logistic", "quality_score_quantile",
        "shared_shingle", "rare_bigram", "entropy", "pii", "gopher",
    )),
]


def primary_name(stmt) -> str:
    if isinstance(stmt, ast.FunctionDef):
        for d in stmt.decorator_list:
            if (
                isinstance(d, ast.Call)
                and getattr(d.func, "id", "") == "query"
                and d.args
                and isinstance(d.args[0], ast.Constant)
            ):
                return d.args[0].value
        return stmt.name
    if isinstance(stmt, ast.Assign):
        return stmt.targets[0].id if isinstance(stmt.targets[0], ast.Name) else ""
    if isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
        return stmt.target.id
    return ""


def defined_names(stmt) -> list[str]:
    if isinstance(stmt, ast.FunctionDef):
        return [stmt.name]
    if isinstance(stmt, ast.Assign):
        return [t.id for t in stmt.targets if isinstance(t, ast.Name)]
    if isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
        return [stmt.target.id]
    return []


def natural_module(stmt) -> str:
    name = primary_name(stmt)
    if name in OVERRIDES:
        return OVERRIDES[name]
    low = name.lower()
    for mod, keys in KEYWORD_RULES:
        if any(k in low for k in keys):
            return mod
    return "relational"


def main() -> None:
    dry = "--dry-run" in sys.argv
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    registry_names = {
        "QueryFn", "_QUERIES", "_ORACLES", "_IVF_CENTROIDS", "query",
        "load", "_PRIORITY", "_ordered", "queries", "oracle_sql",
    }

    header_end = None  # line no (1-based) of last ImportFrom
    units = []  # (stmt, start_line, end_line)
    module_doc = None
    for stmt in tree.body:
        if isinstance(stmt, ast.Expr) and isinstance(stmt.value, ast.Constant):
            module_doc = stmt
            continue
        if isinstance(stmt, ast.ImportFrom):
            header_end = stmt.end_lineno
            continue
        units.append(stmt)

    import_block = "".join(lines[module_doc.end_lineno : header_end])

    all_defined = {}
    for u in units:
        for n in defined_names(u):
            if n in all_defined:
                raise SystemExit(f"duplicate top-level name: {n}")
            all_defined[n] = u

    # assignment: registry pinned, everything else natural + dep bump
    idx = {m: i for i, m in enumerate(MODULES)}
    assign = {}
    for u in units:
        names = defined_names(u)
        if (names and names[0] in registry_names) or isinstance(u, ast.Assert):
            assign[id(u)] = "_registry"
        else:
            assign[id(u)] = natural_module(u)

    # registered query name -> the unit whose decorator registers it
    # (needed because _ORACLES["x"] / _QUERIES["x"] lookups are real
    # dependencies on x's registration, invisible to name analysis)
    qname_to_unit = {}
    for u in units:
        if isinstance(u, ast.FunctionDef):
            for d in u.decorator_list:
                if (
                    isinstance(d, ast.Call)
                    and getattr(d.func, "id", "") == "query"
                    and d.args
                    and isinstance(d.args[0], ast.Constant)
                ):
                    qname_to_unit[d.args[0].value] = u

    deps = {}
    for u in units:
        refs = {
            n.id
            for n in ast.walk(u)
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
        }
        d = {
            all_defined[r] for r in refs if r in all_defined and all_defined[r] is not u
        }
        for node in ast.walk(u):
            if (
                isinstance(node, ast.Subscript)
                and isinstance(node.value, ast.Name)
                and node.value.id in ("_ORACLES", "_QUERIES")
                and isinstance(node.slice, ast.Constant)
            ):
                tgt = qname_to_unit.get(node.slice.value)
                if tgt is not None and tgt is not u:
                    d.add(tgt)
        deps[id(u)] = d

    bumped = []
    changed = True
    while changed:
        changed = False
        for u in units:
            want = max(
                [idx[assign[id(u)]]]
                + [idx[assign[id(d)]] for d in deps[id(u)] if assign[id(d)] != "_registry"]
                + [idx[assign[id(d)]] for d in deps[id(u)]]
            )
            if want > idx[assign[id(u)]]:
                bumped.append(
                    f"{primary_name(u) or defined_names(u)}: "
                    f"{assign[id(u)]} -> {MODULES[want]} (dep pull)"
                )
                assign[id(u)] = MODULES[want]
                changed = True

    # ---- report
    by_mod = defaultdict(list)
    for u in units:
        by_mod[assign[id(u)]].append(u)
    for m in MODULES:
        qn = sum(
            1
            for u in by_mod[m]
            if isinstance(u, ast.FunctionDef)
            and any(
                isinstance(d, ast.Call) and getattr(d.func, "id", "") == "query"
                for d in u.decorator_list
            )
        )
        print(f"{m:12s} units={len(by_mod[m]):4d} queries={qn:4d}")
    if bumped:
        print("\ndependency bumps:")
        for b in bumped:
            print(" ", b)
    if dry:
        return

    # ---- emit
    os.makedirs(PKG + "_new", exist_ok=True)

    def unit_source(u) -> str:
        # include leading comment block (contiguous comment/blank lines
        # directly above, stopping at the previous unit's end)
        start = u.lineno - 1
        for d in getattr(u, "decorator_list", []):
            start = min(start, d.lineno - 1)
        s = start
        while s > 0:
            prev = lines[s - 1]
            if prev.strip().startswith("#"):
                s -= 1
            else:
                break
        return "".join(lines[s : u.end_lineno])

    emitted_in = {}  # name -> module
    for m in MODULES:
        for u in by_mod[m]:
            for n in defined_names(u):
                emitted_in[n] = m

    for m in MODULES:
        if not by_mod[m]:
            continue
        body = "\n\n".join(unit_source(u).rstrip("\n") for u in by_mod[m])
        used = {
            n.id
            for u in by_mod[m]
            for n in ast.walk(u)
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
        }
        # cross-module imports (only from earlier modules, guaranteed)
        xmod = defaultdict(set)
        for n in sorted(used):
            src_mod = emitted_in.get(n)
            if src_mod and src_mod != m:
                assert idx[src_mod] < idx[m], (n, src_mod, m)
                xmod[src_mod].add(n)
        ximports = ""
        for sm in MODULES:
            if sm in xmod:
                names = ", ".join(sorted(xmod[sm]))
                line = f"from etl_weather_spark.queries.{sm} import {names}\n"
                if len(line) > 88:
                    line = (
                        f"from etl_weather_spark.queries.{sm} import (\n    "
                        + ",\n    ".join(sorted(xmod[sm]))
                        + ",\n)\n"
                    )
                ximports += line
        # prune the shared header imports to what this module uses
        hdr_lines = []
        for stmt in ast.parse(import_block).body:
            keep = [
                a for a in stmt.names if (a.asname or a.name.split(".")[0]) in used
                or a.name == "annotations"
            ]
            if not keep:
                continue
            names = ", ".join(
                a.name + (f" as {a.asname}" if a.asname else "") for a in keep
            )
            line = f"from {stmt.module} import {names}\n"
            if len(line) > 88:
                line = (
                    f"from {stmt.module} import (\n    "
                    + ",\n    ".join(
                        a.name + (f" as {a.asname}" if a.asname else "") for a in keep
                    )
                    + ",\n)\n"
                )
            hdr_lines.append(line)
        out = (
            f'"""{MODULE_DOC[m]}\n\nSplit from the original queries.py '
            '(round 9); unit order and bodies\nare byte-identical to the '
            'monolith — only module boundaries and\nimports changed.\n"""\n\n'
            + "".join(hdr_lines)
            + ximports
            + "\n\n"
            + body
            + "\n"
        )
        with open(os.path.join(PKG + "_new", m + ".py"), "w") as f:
            f.write(out)

    init = (
        '"""'
        + ast.get_docstring(tree)
        + '\n\nThis package is the split of the former single-file queries.py\n'
        "(domain modules listed in _MODULES); every top-level name of the\n"
        "monolith is hoisted here so `etl_weather_spark.queries.<name>`\n"
        "keeps working for the driver, tests, cli, serve and streaming.\n"
        '"""\n\n'
        + "from etl_weather_spark.queries import (\n    "
        + ",\n    ".join(m for m in MODULES if by_mod[m])
        + ",\n)\n\n_MODULES = ("
        + ", ".join(m for m in MODULES if by_mod[m])
        + ")\n\n"
        + "for _m in _MODULES:\n"
        + "    for _k, _v in vars(_m).items():\n"
        + "        if not _k.startswith('__'):\n"
        + "            globals()[_k] = _v\n"
        + "del _k, _v, _m\n"
    )
    with open(os.path.join(PKG + "_new", "__init__.py"), "w") as f:
        f.write(init)
    print(f"\nwrote {PKG}_new/ — review, then move into place")


if __name__ == "__main__":
    main()
