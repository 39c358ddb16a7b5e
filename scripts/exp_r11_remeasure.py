#!/usr/bin/env python
"""Round-11 quiet-window re-measurement (VERDICT r10 "Next round" #3).

Two queries round 10 left ambiguous, interleaved A/B on one session at
sf0.1 and on the 10x salted corpus (/tmp/scale_10x, built by
bench_scale.py):

- semantic_dedup_ivf: the r10 cell-assignment kernel vs the Catalyst
  broadcast-crossJoin + window-argmax form (now the K-cap fallback —
  forced here by setting IVF_KERNEL_MAX_CENTROIDS = 0).
- prefix_filter_jaccard: the r11 lazy shingle-array fence vs the r9
  unfenced form (each consumer re-runs tokenize+shingle from text).

    python scripts/exp_r11_remeasure.py [n_rounds] [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import etl_weather_spark.queries  # noqa: F401
import etl_weather_spark.operators.similarity as sim
from etl_weather_spark.operators.dedup import (
    _candidates_from_sized_shingles,
    shingles_of_tokens,
    tokens,
    verify_candidates_jaccard,
    widen_narrow_input,
)
from etl_weather_spark.queries._registry import _QUERIES, load
from etl_weather_spark.session import get_spark


def prefix_jaccard_unfenced(spark, sf_dir):
    """The r9 form: no shingle-array fence, consumers recompute."""
    docs = load(spark, sf_dir, "documents")
    toked = widen_narrow_input(docs, "doc_id").select(
        F.col("doc_id"), tokens(F.col("text")).alias("__toks")
    )
    shsets = toked.select(
        F.col("doc_id"),
        F.array_distinct(shingles_of_tokens(F.col("__toks"), 3)).alias(
            "__sh_arr"
        ),
    ).withColumn("n_sh", F.size("__sh_arr"))
    sh = shsets.select("doc_id", "n_sh", F.explode("__sh_arr").alias("sh"))
    cand = _candidates_from_sized_shingles(sh, id_col="doc_id", t=0.5)
    return verify_candidates_jaccard(
        docs, cand, shingle_n=3, min_jaccard=0.5
    ).orderBy("id_a", "id_b")


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.1", "/tmp/scale_10x"]
    spark = get_spark(app_name="exp-r11-remeasure")
    spark.sparkContext.setLogLevel("FATAL")

    for sf_dir in sf_dirs:
        load(spark, sf_dir, "documents").write.format("noop").mode(
            "overwrite"
        ).save()
        cap = sim.IVF_KERNEL_MAX_CENTROIDS

        def ivf_kernel(s, d):
            sim.IVF_KERNEL_MAX_CENTROIDS = cap
            return _QUERIES["semantic_dedup_ivf"](s, d)

        def ivf_catalyst(s, d):
            sim.IVF_KERNEL_MAX_CENTROIDS = 0
            try:
                return _QUERIES["semantic_dedup_ivf"](s, d)
            finally:
                sim.IVF_KERNEL_MAX_CENTROIDS = cap

        variants = [
            ("ivf:kernel", ivf_kernel),
            ("ivf:catalyst", ivf_catalyst),
            ("pfj:fenced", lambda s, d: _QUERIES["prefix_filter_jaccard"](s, d)),
            ("pfj:unfenced", prefix_jaccard_unfenced),
        ]
        times: dict[str, list[float]] = {}
        for rnd_i in range(n_rounds):
            for vname, fn in variants:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                times.setdefault(vname, []).append(dt)
                print(f"[{sf_dir}] round {rnd_i} {vname}: {dt}s", flush=True)
        for vname, ts in times.items():
            print(f"[{sf_dir}] {vname}: min={min(ts)} samples={ts}")
        # row equality (pairs of variants)
        if sf_dir.endswith("sf0.1"):
            a = [tuple(r) for r in ivf_kernel(spark, sf_dir).collect()]
            b = [tuple(r) for r in ivf_catalyst(spark, sf_dir).collect()]
            print(f"[{sf_dir}] ivf rows equal: {a == b}")
            c = [
                tuple(r)
                for r in _QUERIES["prefix_filter_jaccard"](
                    spark, sf_dir
                ).collect()
            ]
            e = [tuple(r) for r in prefix_jaccard_unfenced(spark, sf_dir).collect()]
            print(f"[{sf_dir}] pfj rows equal: {c == e}")
    spark.stop()


if __name__ == "__main__":
    main()
