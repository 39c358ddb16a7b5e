#!/usr/bin/env python
"""Round-11 A/B: per-gate keep-set fences for the funnel family.

Round-10's phase breakdown (this round, guide §1) showed the five
heaviest queries are DRIVER-bound: corpus_prep_funnel_v2 spends
~13-20 s in Python-side plan construction (every .join on the growing
flags tree re-analyzes all seven gate subtrees on the JVM) and <0.7 s
executing. Fencing each gate's narrow keep-set with a lazy
localCheckpoint makes it a LogicalRDD LEAF: the gate subtree is
analyzed/optimized/planned exactly once (at fence construction), and
every later join sees a one-node child. dropDuplicates('doc_id') before
the fence additionally (a) hash-partitions the keep-set by the join key
and (b) lets the optimizer drop the gate query's trailing global sort
below the aggregate (ADVICE r10 #3 robustness, for free).

Variants, interleaved per round:
  A incumbent corpus_prep_funnel_v2 (unfenced keep-sets)
  B fenced keep-sets (select(doc_id) -> localCheckpoint(lazy))
  C dropDuplicates(doc_id) -> fence

    python scripts/exp_fence_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import etl_weather_spark.queries  # noqa: F401  (populates _QUERIES)
from etl_weather_spark.queries._registry import _QUERIES, load
from etl_weather_spark.queries.text import _FUNNEL_GATES
from etl_weather_spark.queries.training import _funnel_stage_report
from etl_weather_spark.session import get_spark


def v2_incumbent(spark, sf_dir):
    return _QUERIES["corpus_prep_funnel_v2"](spark, sf_dir)


def _keeps(spark, sf_dir, dedup: bool):
    out = []
    for name, key, _cond, flt, _core in _FUNNEL_GATES:
        k = flt(_QUERIES[key](spark, sf_dir)).select("doc_id")
        if dedup:
            k = k.dropDuplicates(["doc_id"])
        out.append((name, k.localCheckpoint(eager=False)))
    return out


def v2_fenced(spark, sf_dir):
    return _funnel_stage_report(spark, sf_dir, _keeps(spark, sf_dir, False))


def v2_fenced_dedup(spark, sf_dir):
    return _funnel_stage_report(spark, sf_dir, _keeps(spark, sf_dir, True))


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-fence-ab")
    spark.sparkContext.setLogLevel("FATAL")
    load(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    variants = [
        ("A_incumbent", v2_incumbent),
        ("B_fenced", v2_fenced),
        ("C_fenced_dedup", v2_fenced_dedup),
    ]
    times: dict[str, list[float]] = {}
    rows_by_variant: dict[str, list] = {}
    for rnd_i in range(n_rounds):
        for vname, fn in variants:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            tot = round(t_build + t_exec, 3)
            times.setdefault(vname, []).append(tot)
            print(
                f"round {rnd_i} {vname}: build={t_build:.3f}s "
                f"exec={t_exec:.3f}s total={tot}s",
                flush=True,
            )
            if rnd_i == 0:
                rows_by_variant[vname] = [
                    tuple(r) for r in fn(spark, sf_dir).collect()
                ]
    ref = rows_by_variant["A_incumbent"]
    for vname, rows in rows_by_variant.items():
        print(f"{vname}: rows == incumbent: {rows == ref}")
    for vname, ts in times.items():
        print(f"{vname}: min={min(ts)} samples={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
