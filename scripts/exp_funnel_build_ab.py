#!/usr/bin/env python
"""Round-11 A/B: vestigial-fence removal + single-projection flags for
the funnel family (corpus_prep_funnel_v2 / curated_shard_manifest /
gate_attribution_audit / gate_bias_audit).

Phase profiling (guide §1, this round) showed these queries are
DRIVER-bound: 85-95% of their bench time is Python-side plan
construction — dominated by the lazy localCheckpoint fences, whose
construction runs optimize + physical-plan + whole-stage codegen over
the full 7-gate tree (`Dataset.checkpoint` calls `queryExecution.toRdd`
eagerly). After round 10 collapsed the consumers to ONE aggregation
pass, those fences have a single consumer each — the recompute they
guarded is gone, so they are pure build-time cost now.

Variants (identical results, asserted):
  A incumbent
  B no-fence + one-projection flags:
    - drop the single-consumer fences (per/flags/survivors)
    - flags loop does bare joins; all k_i coalesces land in ONE select
      (the join+withColumn+drop per gate re-analyzed the whole growing
      tree 3x per gate)
    - gate_bias: overall keep-rates derived from per_lang via a global
      window over the tiny (lang) rollup — same longs summed, one
      corpus pass, no second flags consumer, no crossJoin

    python scripts/exp_funnel_build_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

import etl_weather_spark.queries  # noqa: F401  (populates _QUERIES)
from etl_weather_spark.functions.rounding import rnd
from etl_weather_spark.queries._registry import _QUERIES, load
from etl_weather_spark.queries.text import _FUNNEL_GATES
from etl_weather_spark.session import get_spark


def _bare_flags(spark, sf_dir, spine_cols):
    docs = load(spark, sf_dir, "documents").select(*spine_cols)
    flags = docs
    for i, (_name, key, _cond, flt, _core) in enumerate(
        _FUNNEL_GATES, start=1
    ):
        keep = flt(_QUERIES[key](spark, sf_dir)).select(
            "doc_id", F.lit(1).alias(f"__k{i}")
        )
        flags = flags.join(keep, "doc_id", "left")
    return flags


def v2_variant(spark, sf_dir):
    n = len(_FUNNEL_GATES)
    flags = _bare_flags(spark, sf_dir, ["doc_id"])
    ks = [F.coalesce(F.col(f"__k{i}"), F.lit(0)) for i in range(1, n + 1)]
    depth = ks[0]
    prefix = ks[0]
    for i in range(1, n):
        prefix = prefix * ks[i]
        depth = depth + prefix
    per = flags.select("doc_id", depth.alias("__depth"))
    names = ["all_docs"] + [g[0] for g in _FUNNEL_GATES]
    aggs = []
    for i in range(len(names)):
        cond = F.col("__depth") >= i
        aggs.append(F.count(F.when(cond, 1)).cast("long").alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(cond, F.col("doc_id"))).cast("long").alias(f"c{i}")
        )
    one = per.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("stage"),
                F.lit(names[i]).alias("stage_name"),
                F.col(f"n{i}").alias("n_kept"),
                F.col(f"c{i}").alias("id_checksum"),
            )
            for i in range(len(names))
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.stage", "r.stage_name", "r.n_kept", "r.id_checksum")
        .orderBy("stage")
    )


def attribution_variant(spark, sf_dir):
    n = len(_FUNNEL_GATES)
    flags = _bare_flags(spark, sf_dir, ["doc_id"]).select(
        "doc_id",
        *[
            F.coalesce(F.col(f"__k{i}"), F.lit(0)).alias(f"k{i}")
            for i in range(1, n + 1)
        ],
    )
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    for i, (name, _key, _cond, _flt, _core) in enumerate(
        _FUNNEL_GATES, start=1
    ):
        others = sum(F.col(f"k{j}") for j in range(1, n + 1) if j != i)
        aggs.append(F.sum(F.lit(1) - F.col(f"k{i}")).alias(f"__fail{i}"))
        aggs.append(
            F.sum(
                F.when(
                    (F.col(f"k{i}") == 0) & (others == n - 1), 1
                ).otherwise(0)
            ).alias(f"__uniq{i}")
        )
    one = flags.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("gate"),
                F.lit(name).alias("gate_name"),
                F.col(f"__fail{i}").alias("fail"),
                F.col(f"__uniq{i}").alias("uniq"),
            )
            for i, (name, _key, _cond, _flt, _core) in enumerate(
                _FUNNEL_GATES, start=1
            )
        ]
    )
    return (
        one.select("__cnt", F.explode(rows).alias("r"))
        .select(
            F.col("r.gate").alias("gate"),
            F.col("r.gate_name").alias("gate_name"),
            F.col("r.fail").cast("long").alias("n_fail"),
            F.col("r.uniq").cast("long").alias("n_unique_fail"),
            rnd(F.col("r.fail") * 1.0 / F.col("__cnt"), 6).alias("fail_rate6"),
            rnd(F.col("r.uniq") * 1.0 / F.col("__cnt"), 6).alias(
                "unique_fail_rate6"
            ),
        )
        .orderBy("gate")
    )


def bias_variant(spark, sf_dir):
    n = len(_FUNNEL_GATES)
    flags = _bare_flags(spark, sf_dir, ["doc_id", "lang"]).select(
        "doc_id",
        "lang",
        *[
            F.coalesce(F.col(f"__k{i}"), F.lit(0)).alias(f"k{i}")
            for i in range(1, n + 1)
        ],
    )
    per_lang = flags.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum(f"k{i}").cast("long").alias(f"__kept{i}")
            for i in range(1, n + 1)
        ],
    )
    w = Window.partitionBy()
    enriched = per_lang.select(
        "lang",
        "n_docs",
        *[F.col(f"__kept{i}") for i in range(1, n + 1)],
        *[
            rnd(
                F.sum(f"__kept{i}").over(w) * 1.0 / F.sum("n_docs").over(w), 6
            ).alias(f"__orate{i}")
            for i in range(1, n + 1)
        ],
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("gate"),
                F.lit(name).alias("gate_name"),
                F.col(f"__kept{i}").alias("n_kept"),
                F.col(f"__orate{i}").alias("overall_keep_rate6"),
            )
            for i, (name, _key, _cond, _flt, _core) in enumerate(
                _FUNNEL_GATES, start=1
            )
        ]
    )
    keep_rate6 = rnd(F.col("r.n_kept") * 1.0 / F.col("n_docs"), 6)
    return (
        enriched.select("lang", "n_docs", F.explode(cells).alias("r"))
        .select(
            F.col("r.gate").alias("gate"),
            F.col("r.gate_name").alias("gate_name"),
            "lang",
            "n_docs",
            F.col("r.n_kept").alias("n_kept"),
            keep_rate6.alias("keep_rate6"),
            F.col("r.overall_keep_rate6").alias("overall_keep_rate6"),
            rnd(keep_rate6 - F.col("r.overall_keep_rate6"), 6).alias("bias6"),
            (F.abs(keep_rate6 - F.col("r.overall_keep_rate6")) > 0.1).alias(
                "flagged"
            ),
        )
        .orderBy("gate", "lang")
    )


def curated_variant(spark, sf_dir):
    from etl_weather_spark.functions.text import doc_fingerprint

    n = len(_FUNNEL_GATES)
    docs = load(spark, sf_dir, "documents")
    flags = _bare_flags(spark, sf_dir, ["doc_id"])
    survivors = flags.filter(
        sum(
            (
                F.coalesce(F.col(f"__k{i}"), F.lit(0))
                for i in range(1, n + 1)
            ),
            start=F.lit(0),
        )
        == n
    ).select("doc_id")
    keepers = (
        docs.select(
            "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
        )
        .join(survivors, "doc_id", "left_semi")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 16
    )
    return (
        keepers.select(shard.alias("shard_id"), "doc_id")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("shard_id")
    )


PAIRS = [
    ("corpus_prep_funnel_v2", v2_variant),
    ("gate_attribution_audit", attribution_variant),
    ("gate_bias_audit", bias_variant),
    ("curated_shard_manifest", curated_variant),
]


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-funnel-build-ab")
    spark.sparkContext.setLogLevel("FATAL")
    load(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, list[float]] = {}
    for rnd_i in range(n_rounds):
        for qname, variant in PAIRS:
            for vname, fn in (
                ("A", lambda s, d, q=qname: _QUERIES[q](s, d)),
                ("B", variant),
            ):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t_build = time.perf_counter() - t0
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t_exec = time.perf_counter() - t1
                tot = round(t_build + t_exec, 3)
                times.setdefault(f"{qname}:{vname}", []).append(tot)
                print(
                    f"round {rnd_i} {qname}:{vname} build={t_build:.3f}s "
                    f"exec={t_exec:.3f}s total={tot}s",
                    flush=True,
                )
    for qname, variant in PAIRS:
        a = [tuple(r) for r in _QUERIES[qname](spark, sf_dir).collect()]
        b = [tuple(r) for r in variant(spark, sf_dir).collect()]
        print(f"{qname}: variant rows == incumbent: {a == b}")
    for key, ts in times.items():
        print(f"{key}: min={min(ts)} samples={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
