#!/usr/bin/env python
"""Round-11 follow-up: the shingle-fence A/B/C again, but through ALL
five bench consumers interleaved in one session (the single-query A/B
missed an interaction the full bench exposed).

  A  r10 persist()+count(), no unpersist (leaks)
  B  lazy localCheckpoint
  C  persist -> eager-checkpoint narrow candidates -> unpersist

    python scripts/exp_shingle_family_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import etl_weather_spark.operators.dedup as dd
import etl_weather_spark.queries  # noqa: F401
from etl_weather_spark.queries._registry import _QUERIES, load
from etl_weather_spark.session import get_spark

QUERIES = [
    "prefix_filter_jaccard",
    "containment_pairs",
    "lsh_recall_audit",
    "lsh_scurve_calibration",
    "lsh_recall_audit_sampled",
]


def _pfc(mode):
    def prefix_filter_candidates(docs, *, text_col="text", id_col="doc_id",
                                 shingle_n=3, min_jaccard=0.5):
        toked = dd.widen_narrow_input(docs, id_col).select(
            F.col(id_col), dd.tokens(F.col(text_col)).alias("__toks")
        )
        shsets = toked.select(
            F.col(id_col),
            F.array_distinct(
                dd.shingles_of_tokens(F.col("__toks"), shingle_n)
            ).alias("__sh_arr"),
        ).withColumn("n_sh", F.size("__sh_arr"))
        if mode == "B":
            shsets = shsets.localCheckpoint(eager=False)
        else:
            shsets = shsets.persist()
            shsets.count()
        sh = shsets.select(id_col, "n_sh", F.explode("__sh_arr").alias("sh"))
        cand = dd._candidates_from_sized_shingles(
            sh, id_col=id_col, t=min_jaccard
        )
        if mode == "C":
            cand = cand.localCheckpoint(eager=True)
            shsets.unpersist()
        return cand

    return prefix_filter_candidates


def _cc(mode):
    def containment_candidates(docs, *, text_col="text", id_col="doc_id",
                               shingle_n=3, min_containment=0.8):
        from pyspark.sql import Window

        toked = dd.widen_narrow_input(docs, id_col).select(
            F.col(id_col), dd.tokens(F.col(text_col)).alias("__toks")
        )
        shsets = toked.select(
            F.col(id_col),
            F.array_distinct(
                dd.shingles_of_tokens(F.col("__toks"), shingle_n)
            ).alias("__sh_arr"),
        ).withColumn("n_sh", F.size("__sh_arr"))
        if mode == "B":
            shsets = shsets.localCheckpoint(eager=False)
        else:
            shsets = shsets.persist()
            shsets.count()
        sized = shsets.select(id_col, "n_sh", F.explode("__sh_arr").alias("sh"))
        dfreq = sized.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy(id_col).orderBy("df", "sh")
        t = float(min_containment)
        prefix = (
            sized.join(dfreq, "sh")
            .withColumn("rnk", F.row_number().over(w))
            .filter(
                F.col("rnk")
                <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1
            )
            .select(
                F.col(id_col).alias("id_p"), "sh", F.col("n_sh").alias("n_p")
            )
        )
        index = sized.select(
            F.col(id_col).alias("id_f"), "sh", F.col("n_sh").alias("n_f")
        )
        cand = (
            prefix.join(index, "sh")
            .filter(
                (F.col("n_p") < F.col("n_f"))
                | (
                    (F.col("n_p") == F.col("n_f"))
                    & (F.col("id_p") < F.col("id_f"))
                )
            )
            .select(
                F.least("id_p", "id_f").alias("id_a"),
                F.greatest("id_p", "id_f").alias("id_b"),
            )
            .distinct()
        )
        if mode == "C":
            cand = cand.localCheckpoint(eager=True)
            shsets.unpersist()
        return cand

    return containment_candidates


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-shingle-family")
    spark.sparkContext.setLogLevel("FATAL")
    load(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    times: dict[str, list[float]] = {}
    for r in range(n_rounds):
        for mode in ("C", "B"):
            dd.prefix_filter_candidates = _pfc(mode)
            dd.containment_candidates = _cc(mode)
            t0 = time.perf_counter()
            for q in QUERIES:
                _QUERIES[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            dt = round(time.perf_counter() - t0, 3)
            times.setdefault(mode, []).append(dt)
            print(f"r{r} mode {mode}: family total {dt}s", flush=True)
    for m, ts in times.items():
        print(f"{m}: min={min(ts)} samples={ts}")
    print(
        "persistent RDDs at end:",
        spark.sparkContext._jsc.sc().getPersistentRDDs().size(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
