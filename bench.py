#!/usr/bin/env python
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR and
print ONE JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a count-style action that cannot be
optimized into metadata-only (collect on the final plan). Timings are
per-query wall clock after a shared warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

from etl_weather_spark import queries as q
from etl_weather_spark.session import get_spark

#: queries timed by the bench — the headline set covering scan/agg,
#: shuffle join, broadcast star join, window, as-of, text, top-k.
HEADLINE = [
    "daily_flags",
    "hourly_outer_join",
    "rolling_avg_7d",
    "rank_pct_diff",
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
    "asof_join",
    "doc_stats",
    "dedup_exact",
    # second wave: semi-join, band join, sessionization, pivot,
    # pushdown filter-agg, left-join histogram
    "forecast_revenue",
    "priority_order_counts",
    "error_after_click",
    "user_sessions",
    "pivot_event_values",
    "customer_order_distribution",
    # dedup-at-scale production paths (xxhash64 LSH, rolling-hash winnow)
    "minhash_lsh_fast",
    "winnow_candidates",
    # third wave: rank-1 window over broadcast star (Q2-shaped), 5-way
    # join profit rollup (Q9-shaped)
    "cheapest_supplier",
    "nation_profit",
    # fourth wave: grouping-sets rank window, broadcast shingle
    # decontamination, shuffle-free regex scrub
    "rollup_rank",
    "decontaminate_overlap",
    "redact_terms",
    # fifth wave: two-level token agg (repetition quality pre-filter)
    "token_repetition",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-weather-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    # warm-up: JVM + parquet footer reads, not counted
    registry["daily_agg"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink computes every output column (count() would let
        # Catalyst prune projection-only plans down to a row count)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
