#!/usr/bin/env python
"""Round-11 interleaved A/B/C: fence form for the PPJoin shingle-array
relation (prefix_filter_candidates), measured through its heaviest
consumer prefix_filter_jaccard.

  A  r10 incumbent: persist()+count(), NO unpersist (leaks one
     CacheManager relation per invocation — the thing being fixed)
  B  lazy localCheckpoint (no leak, but concurrent consumer branches
     recompute the post-shuffle shingle projection, and each of the
     ~100 plan replicas deserializes full checkpoint rows instead of
     column-pruned columnar cache scans)
  C  persist()+count() -> eagerly checkpoint the NARROW candidate set
     -> unpersist (the connected_components convention; no leak, same
     columnar reads as A)

All three return identical rows (asserted).

    python scripts/exp_shingle_fence_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import etl_weather_spark.queries  # noqa: F401
from etl_weather_spark.functions.rounding import rnd
from etl_weather_spark.operators.dedup import (
    _candidates_from_sized_shingles,
    shingles_of_tokens,
    tokens,
    verify_candidates_jaccard,
    widen_narrow_input,
)
from etl_weather_spark.queries._registry import load
from etl_weather_spark.session import get_spark


def _shsets(docs):
    toked = widen_narrow_input(docs, "doc_id").select(
        F.col("doc_id"), tokens(F.col("text")).alias("__toks")
    )
    return toked.select(
        F.col("doc_id"),
        F.array_distinct(shingles_of_tokens(F.col("__toks"), 3)).alias(
            "__sh_arr"
        ),
    ).withColumn("n_sh", F.size("__sh_arr"))


def cand_a(docs):  # r10: persist+count, leak
    shsets = _shsets(docs).persist()
    shsets.count()
    sh = shsets.select("doc_id", "n_sh", F.explode("__sh_arr").alias("sh"))
    return _candidates_from_sized_shingles(sh, id_col="doc_id", t=0.5)


def cand_b(docs):  # lazy checkpoint
    shsets = _shsets(docs).localCheckpoint(eager=False)
    sh = shsets.select("doc_id", "n_sh", F.explode("__sh_arr").alias("sh"))
    return _candidates_from_sized_shingles(sh, id_col="doc_id", t=0.5)


def cand_c(docs):  # persist -> eager cand checkpoint -> unpersist
    shsets = _shsets(docs).persist()
    shsets.count()
    sh = shsets.select("doc_id", "n_sh", F.explode("__sh_arr").alias("sh"))
    cand = _candidates_from_sized_shingles(sh, id_col="doc_id", t=0.5)
    cand = cand.localCheckpoint(eager=True)
    shsets.unpersist()
    return cand


def pfj(docs, cand_fn):
    cand = cand_fn(docs)
    pairs = verify_candidates_jaccard(docs, cand, shingle_n=3, min_jaccard=0.5)
    return pairs.select(
        "id_a", "id_b", rnd(F.col("jaccard"), 4).alias("jaccard")
    )


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-shingle-fence")
    spark.sparkContext.setLogLevel("FATAL")
    docs = load(spark, sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()
    variants = [("A_persist_leak", cand_a), ("B_lazy_ckpt", cand_b), ("C_persist_unpersist", cand_c)]
    times: dict[str, list[float]] = {}
    for r in range(n_rounds):
        for vname, fn in variants:
            t0 = time.perf_counter()
            pfj(docs, fn).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            times.setdefault(vname, []).append(dt)
            print(f"r{r} {vname}: {dt}s", flush=True)
    rows = {
        v: sorted(tuple(x) for x in pfj(docs, fn).collect())
        for v, fn in variants
    }
    print("rows equal:", rows["A_persist_leak"] == rows["B_lazy_ckpt"] == rows["C_persist_unpersist"])
    for v, ts in times.items():
        print(f"{v}: min={min(ts)} samples={ts}")
    n_pinned = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    print(f"persistent RDDs at end (A leaked {n_rounds}+1, C released): {n_pinned}")
    spark.stop()


if __name__ == "__main__":
    main()
