"""Driver-style correctness gate, run locally at sf0.001.

Mirrors what the driver does at sf0.01: run each registered Spark query
AND its DuckDB oracle SQL on the same parquet tables, compare row count,
column names, and an order-insensitive value multiset.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_weather_spark import queries as q

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _multiset(rows, columns):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm(r[i]) for i in idx) for r in rows)


ORACLES = q.oracle_sql()
NAMES = sorted(q.queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = q.queries()[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # weaker rows-only check for non-SQL-expressible ops
        assert len(spark_rows) >= 0
        return

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ms_s = _multiset(spark_rows, spark_cols)
    ms_d = _multiset(duck_rows, duck_cols)
    if ms_s != ms_d:
        diff = [(a, b) for a, b in zip(ms_s, ms_d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_funnel_v3_refits_diverge_from_v2_exactly_at_fitted_gates(spark, sf_dir):
    """v3 re-fits each gate's statistics on the prior stage's
    survivors. Per-document gates (stages 1-4: lang-ID, code routing,
    Gopher rules, fixed-weight logistic) must decide identically to
    v2; the fitted gates (stage 5 MAD, 6 perplexity terciles, 7 DSIR)
    must diverge — the refit moving boundaries is the whole point of
    the CCNet/RefinedWeb parameterization."""
    from etl_weather_spark import queries as q

    v2 = {r.stage: (r.n_kept, r.id_checksum)
          for r in q.corpus_prep_funnel_v2(spark, sf_dir).collect()}
    v3 = {r.stage: (r.n_kept, r.id_checksum)
          for r in q.corpus_prep_funnel_v3(spark, sf_dir).collect()}
    assert set(v2) == set(v3) == set(range(8))
    for s in range(5):  # all_docs + the four per-doc gates
        assert v2[s] == v3[s], f"per-doc stage {s} must not move"
    assert any(v2[s] != v3[s] for s in (5, 6, 7)), (
        "refitting must move at least one fitted-gate boundary"
    )


def test_lsh_recall_core_zero_exact_pairs_yields_null_recall(spark):
    """Round-7 review repro: a corpus where banding produces a
    candidate but NO pair reaches exact Jaccard >= 0.5 (reachable in
    the 25% sampled audit, where true pairs decimate quadratically).
    recall4 must be NULL — not a Spark NaN (or ANSI divide-by-zero)
    diverging from DuckDB's 0/0 -> NULL."""
    import math

    from etl_weather_spark import queries as q

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango")
    mod = ("alpha bravo charlie delta echo foxtrot golf hotel india "
           "juliet kilo lima mike z0w0 z0w1 z0w2 z0w3 z0w4 z0w5 z0w6")
    df = spark.createDataFrame(
        [(1, base), (2, mod)], "doc_id long, text string"
    )
    rows = q._lsh_recall_core(df).collect()
    assert rows, "the pinned pair must band-collide"
    for r in rows:
        assert r.n_exact_total == 0
        assert r.recall4 is None or not math.isnan(r.recall4)
        assert r.recall4 is None  # NULL, matching DuckDB 0/0


def test_funnel_gate_table_is_single_source(spark):
    """Round-7 review: the gate chain lives in ONE table consumed by
    all four funnel surfaces; the v2 and v3 oracles must list the same
    stages in the same order."""
    import re

    from etl_weather_spark import queries as q

    names = [n for n, *_ in q._FUNNEL_GATES]
    v2 = q._ORACLES["corpus_prep_funnel_v2"]
    v3 = q._ORACLES["corpus_prep_funnel_v3"]
    for oracle in (v2, v3):
        stages = re.findall(r"'(\w+)' AS stage_name", oracle)
        assert stages == ["all_docs"] + names


def test_funnel_gate_keep_sets_unique_per_doc(spark, sf_dir):
    """ADVICE r10 #3: the flags funnels LEFT-join gate keep-sets onto
    the doc spine, so a duplicate doc_id in any keep-set would silently
    multiply spine rows. Rather than paying a dropDuplicates exchange
    per gate at runtime (A/B'd slower, round 11), pin the invariant the
    joins rely on: every registered gate emits exactly one row per
    doc_id (each ends in a per-doc aggregate or per-row projection)."""
    from etl_weather_spark import queries as q
    from etl_weather_spark.queries._registry import _QUERIES

    for name, key, _cond, flt, _core in q._FUNNEL_GATES:
        keep = flt(_QUERIES[key](spark, sf_dir)).select("doc_id")
        n = keep.count()
        nd = keep.distinct().count()
        assert n == nd, f"gate {name} ({key}) emits duplicate doc_ids"
