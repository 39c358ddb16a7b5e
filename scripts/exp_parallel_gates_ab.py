#!/usr/bin/env python
"""Round-11 A/B: concurrent gate construction for the funnel family.

Measured this round (guide §1): `localCheckpoint(eager=False)` under
AQE submits a REAL Spark job at construction (AdaptiveSparkPlanExec
materializes its stages inside toRdd), so each gate's internal fences
execute SERIALLY while the funnel query is being built — the 32-core
executor idles through a chain of small single-gate jobs (the 8->32
core scaling plateau the r10 verdict flagged). Building the seven
INDEPENDENT gate keep-sets in a thread pool lets the scheduler overlap
those jobs; identical plans, identical results, same single-query
bench protocol.

    python scripts/exp_parallel_gates_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_weather_spark.queries  # noqa: F401
from etl_weather_spark.queries._registry import _QUERIES, load
from etl_weather_spark.queries.text import _FUNNEL_GATES
from etl_weather_spark.queries.training import _funnel_stage_report
from etl_weather_spark.session import get_spark


def v2_parallel(spark, sf_dir):
    def one(args):
        name, key, _cond, flt, _core = args
        return (name, flt(_QUERIES[key](spark, sf_dir)).select("doc_id"))

    with ThreadPoolExecutor(max_workers=len(_FUNNEL_GATES)) as ex:
        gates = list(ex.map(one, _FUNNEL_GATES))
    return _funnel_stage_report(spark, sf_dir, gates)


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-parallel-gates")
    spark.sparkContext.setLogLevel("FATAL")
    load(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    variants = [
        ("A_serial", lambda s, d: _QUERIES["corpus_prep_funnel_v2"](s, d)),
        ("B_parallel", v2_parallel),
    ]
    times: dict[str, list[float]] = {}
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
    a = [tuple(r) for r in _QUERIES["corpus_prep_funnel_v2"](spark, sf_dir).collect()]
    b = [tuple(r) for r in v2_parallel(spark, sf_dir).collect()]
    print(f"rows equal: {a == b}")
    for vname, ts in times.items():
        print(f"{vname}: min={min(ts)} samples={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
