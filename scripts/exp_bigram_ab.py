#!/usr/bin/env python
"""Round-11 A/B: _bigram_logprob_core incumbent (posexplode + lead
window) vs restructured candidate (arrays_zip slice bigrams — codegen,
no window shuffle; c12 derived from the fenced (doc,bg) agg; n_tokens
from size(tk) — no explode). Exact-equality check + interleaved
noop-sink timing, plus composed-consumer timing (ccnet core on both).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import rnd
from etl_weather_spark.queries._registry import load
from etl_weather_spark.queries.text import _bigram_logprob_core
from etl_weather_spark.session import get_spark


def bigram_core_v2(docs: DataFrame) -> DataFrame:
    tk = F.split("text", " ")
    # bigram rows via codegen slice+arrays_zip (no posexplode, no lead
    # window shuffle+sort; zip_with/aggregate HOFs are interpreted,
    # slice/arrays_zip are not)
    z = F.arrays_zip(
        F.slice(tk, 1, F.size(tk) - 1), F.slice(tk, 2, F.size(tk) - 1)
    )
    b = (
        docs.select("doc_id", F.explode(z).alias("p"))
        .select(
            "doc_id",
            F.col("p.0").alias("w1"),
            F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("bg"),
        )
    )
    db = b.groupBy("doc_id", "bg").agg(
        F.min("w1").alias("w1"), F.count(F.lit(1)).cast("long").alias("d12")
    ).localCheckpoint(eager=False)
    # c12 = corpus bigram counts = sum of per-doc counts (identical
    # longs), derived from the fenced db instead of a second full
    # explode+shuffle of every bigram occurrence
    c12 = db.groupBy("bg").agg(F.sum("d12").cast("long").alias("c12"))
    toks = docs.select("doc_id", F.explode(tk).alias("tok"))
    c1 = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    ).localCheckpoint(eager=False)
    vv = c1.agg(F.count(F.lit(1)).cast("long").alias("v"))
    contrib = F.col("d12").cast("double") * (
        F.log2(F.col("c1") + F.lit(0.5) * F.col("v"))
        - F.log2(F.col("c12") + F.lit(0.5))
    )
    per = (
        db.join(c12, "bg")
        .join(c1, F.col("w1") == F.col("tok"))
        .crossJoin(F.broadcast(vv))
        .select("doc_id", contrib.alias("contrib"), "d12")
    )
    agg = per.groupBy("doc_id").agg(
        (
            F.sum(
                F.floor(F.col("contrib") * F.lit(1000000) + F.lit(0.5)).cast(
                    "long"
                )
            ).cast("double")
            / F.lit(1000000)
        ).alias("s"),
        F.sum("d12").cast("long").alias("n_bigrams"),
    )
    # n_tokens = size of the split array — no explode, no shuffle
    tot = docs.select(
        "doc_id", F.size(tk).cast("long").alias("n_tokens")
    )
    return (
        tot.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.when(F.col("n_bigrams").isNull(), F.lit(0.0))
            .otherwise(rnd(F.col("s") / F.col("n_bigrams"), 6))
            .alias("avg_nll2"),
        )
        .orderBy("doc_id")
    )




def bigram_core_v3(docs: DataFrame) -> DataFrame:
    """Incumbent window shape, two surgical cuts: n_tokens from
    size(split) (no third toks consumer), c12 derived from db (no
    second full bigram aggregation pass)."""
    tk = F.split("text", " ")
    toks = docs.select(
        "doc_id", F.posexplode(tk).alias("pos", "tok")
    )
    g = toks.select(
        "doc_id",
        "tok",
        F.lead("tok", 1)
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .alias("nxt"),
    )
    b = g.filter(F.col("nxt").isNotNull()).select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.concat_ws(" ", "tok", "nxt").alias("bg"),
    )
    db = b.groupBy("doc_id", "bg").agg(
        F.min("w1").alias("w1"), F.count(F.lit(1)).cast("long").alias("d12")
    )
    c12 = db.groupBy("bg").agg(F.sum("d12").cast("long").alias("c12"))
    c1 = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vv = c1.agg(F.count(F.lit(1)).cast("long").alias("v"))
    contrib = F.col("d12").cast("double") * (
        F.log2(F.col("c1") + F.lit(0.5) * F.col("v"))
        - F.log2(F.col("c12") + F.lit(0.5))
    )
    per = (
        db.join(c12, "bg")
        .join(c1, F.col("w1") == F.col("tok"))
        .crossJoin(F.broadcast(vv))
        .select("doc_id", contrib.alias("contrib"), "d12")
    )
    agg = per.groupBy("doc_id").agg(
        (
            F.sum(
                F.floor(F.col("contrib") * F.lit(1000000) + F.lit(0.5)).cast(
                    "long"
                )
            ).cast("double")
            / F.lit(1000000)
        ).alias("s"),
        F.sum("d12").cast("long").alias("n_bigrams"),
    )
    tot = docs.select("doc_id", F.size(tk).cast("long").alias("n_tokens"))
    return (
        tot.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.when(F.col("n_bigrams").isNull(), F.lit(0.0))
            .otherwise(rnd(F.col("s") / F.col("n_bigrams"), 6))
            .alias("avg_nll2"),
        )
        .orderBy("doc_id")
    )

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-bigram-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()

    # exact equality first
    a = _bigram_logprob_core(docs).collect()
    b = bigram_core_v2(docs).collect()
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        assert tuple(ra) == tuple(rb), (ra, rb)
    print(f"EXACT MATCH on {len(a)} rows", flush=True)

    variants = {"incumbent": _bigram_logprob_core, "v2": bigram_core_v2, "v3": bigram_core_v3}
    times: dict[str, list[float]] = {}
    for rnd_i in range(4):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"bigram:{name} r{rnd_i}")
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            times.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} samples={ts}", flush=True)
    spark.stop()




def main_composed() -> None:
    import etl_weather_spark.queries.text as qt

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-bigram-ab-ccnet")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    docs.write.format("noop").mode("overwrite").save()

    orig = qt._bigram_logprob_core

    def run_ccnet(core):
        qt._bigram_logprob_core = core
        try:
            df = qt._ccnet_ppl_core(docs).filter(
                F.col("bucket") != "tail"
            ).select("doc_id")
            df.write.format("noop").mode("overwrite").save()
        finally:
            qt._bigram_logprob_core = orig

    # equality of the composed output too
    qt._bigram_logprob_core = orig
    a = qt._ccnet_ppl_core(docs).collect()
    qt._bigram_logprob_core = bigram_core_v2
    b = qt._ccnet_ppl_core(docs).collect()
    qt._bigram_logprob_core = bigram_core_v3
    c = qt._ccnet_ppl_core(docs).collect()
    qt._bigram_logprob_core = orig
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [tuple(r) for r in a] == [tuple(r) for r in c]
    print(f"CCNET EXACT MATCH on {len(a)} rows (v2 and v3)", flush=True)

    times: dict[str, list[float]] = {}
    for rnd_i in range(4):
        for name, core in (("incumbent", orig), ("v2", bigram_core_v2), ("v3", bigram_core_v3)):
            spark.sparkContext.setJobDescription(f"ccnet:{name} r{rnd_i}")
            t0 = time.perf_counter()
            run_ccnet(core)
            times.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    for name, ts in times.items():
        print(f"ccnet+{name}: min={min(ts):.3f} samples={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "composed":
        main_composed()
    else:
        main()
