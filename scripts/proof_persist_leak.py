#!/usr/bin/env python
"""Cached-block accumulation proof for the round-11 persist-leak fix
(VERDICT r10 "What's wrong" #1 / "Next round" #2).

Runs the four consumers of prefix_filter_candidates /
containment_candidates (prefix_filter_jaccard, containment_pairs,
lsh_recall_audit, lsh_scurve_calibration) N times each in ONE session
and prints the JVM persistent-RDD count after every execution, then
after a driver GC. Before the fix each invocation pinned one more
MEMORY_AND_DISK relation forever (persist()+count() with no unpersist);
after the fix (lazy localCheckpoint) blocks are released by the
ContextCleaner once the query plan is dropped.

    python scripts/proof_persist_leak.py [n_rounds]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_weather_spark.queries  # noqa: F401  (populates _QUERIES)
from etl_weather_spark.queries._registry import _QUERIES
from etl_weather_spark.session import get_spark

QUERIES = [
    "prefix_filter_jaccard",
    "containment_pairs",
    "lsh_recall_audit",
    "lsh_scurve_calibration",
]


def n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="proof-persist-leak")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"persistent RDDs at start: {n_persistent(spark)}")
    for rnd_i in range(n_rounds):
        for name in QUERIES:
            df = _QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            del df
            print(
                f"round {rnd_i} {name}: persistent RDDs = "
                f"{n_persistent(spark)}",
                flush=True,
            )
    # drop every python-side plan reference, then apply REAL driver
    # allocation pressure: System.gc() alone does not reclaim the
    # weakly-held fence RDDs under G1 (measured — 12 polls, no change),
    # but one genuine collection cycle releases every one of them via
    # the ContextCleaner. A persist()-leaked relation, by contrast,
    # survives this because the session CacheManager holds a STRONG
    # reference until unpersist — that is the class of leak the
    # round-11 fix removes.
    gc.collect()
    j = spark.sparkContext._jvm
    for round_i in range(10):
        arr = j.java.util.ArrayList()
        for _ in range(100):
            arr.add(
                j.java.util.Arrays.toString(
                    j.java.util.stream.IntStream.range(0, 1000000).toArray()
                )
            )
        arr = None
        gc.collect()
        j.System.gc()
        time.sleep(3)
        n = n_persistent(spark)
        print(f"persistent RDDs after GC pressure {round_i}: {n}", flush=True)
        if n == 0:
            break
    spark.stop()


if __name__ == "__main__":
    main()
