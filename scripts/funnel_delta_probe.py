#!/usr/bin/env python
"""Delta-funnel scaling probe: does incremental funnel cost track the
DELTA size or the CORPUS size?

Builds a standing accepted snapshot from the even-doc_id half of the
1x corpus and of an Rx salted corpus (scripts/bench_scale.py's
generator), then times ``funnel_delta_report`` for the SAME fixed-size
delta against both. corpus_prep_funnel_v4 re-scans the whole corpus
per run (its Rx ratio in scale tables is the full-recompute cost); the
delta path should stay near-flat because only the standing index's
32-byte fingerprint column scales, never the gate chain's input.

Usage: python scripts/funnel_delta_probe.py [R] [delta_rows]
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_weather_spark import queries as q  # noqa: E402
from etl_weather_spark.session import get_spark  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DELTA_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = f"/tmp/scale_{R}x"
WORK = f"/tmp/funnel_delta_probe_{R}x"


def main() -> None:
    import shutil

    import scripts.bench_scale as bs
    from etl_weather_spark.streaming.classifier_scorer import (
        pin_trained_weights,
    )
    from etl_weather_spark.streaming.trained_funnel import (
        funnel_delta_report,
        process_trained_funnel_batch,
    )

    spark = get_spark(app_name="funnel-delta-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.environ.setdefault("SPARK_GRAFT_SCALE_REUSE", "1")
    bs.build(spark)  # reuses a generator-current Rx corpus, else rebuilds
    if os.path.isdir(WORK):
        shutil.rmtree(WORK)

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    # deploy-time weights: the committed 1x model (the standing corpus
    # scales; the pinned model does not retrain per delta)
    weights = pin_trained_weights(spark, BASE)
    delta = (
        q.load(spark, BASE, "documents")
        .select(*cols)
        .filter(F.col("doc_id") % 2 == 1)
        .orderBy("doc_id")
        .limit(DELTA_ROWS)
        .localCheckpoint()
    )

    result = {"R": R, "delta_rows": delta.count()}
    for tag, src in (("1x", BASE), ("Rx", OUT)):
        docs = q.load(spark, src, "documents").select(*cols)
        even = docs.filter(F.col("doc_id") % 2 == 0)
        accepted = os.path.join(WORK, f"accepted_{tag}")
        t0 = time.perf_counter()
        process_trained_funnel_batch(
            even, 0,
            accepted_table=accepted,
            stats_dir=os.path.join(WORK, f"stats_{tag}"),
            weights=weights,
        )
        t_build = time.perf_counter() - t0
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = funnel_delta_report(
                delta, accepted_table=accepted, weights=weights
            ).collect()
            samples.append(time.perf_counter() - t0)
        result[f"standing_docs_{tag}"] = even.count()
        result[f"t_build_{tag}"] = round(t_build, 2)
        result[f"t_delta_{tag}"] = round(min(samples), 2)
        result[f"delta_new_unique_{tag}"] = rows[-1].n_kept
    result["delta_ratio"] = round(
        result["t_delta_Rx"] / result["t_delta_1x"], 2
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
