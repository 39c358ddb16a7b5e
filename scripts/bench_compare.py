#!/usr/bin/env python
"""Spark (cold/warm) vs DuckDB per-query comparison at a given SF.

Runs every DuckDB-oracled query in the registry three ways:
- spark_cold: first execution (Catalyst planning + codegen included)
- spark_warm: best of 2 subsequent executions (the steady-state cost)
- duckdb: the oracle SQL, warm (best of 3)

Prints one JSON line: totals plus the top-N widest warm gaps, which is
the honest fixed-overhead story BASELINE.md summarizes — at toy SF the
gap is per-query scheduling constants, not per-row work.

Usage: python scripts/bench_compare.py [sf_dir] [top_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_weather_spark import queries as q
from etl_weather_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="etl-weather-spark-compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry, oracles = q.queries(), q.oracle_sql()
    registry["daily_agg"](spark, sf_dir).collect()  # session warm-up

    rows = []
    for name in sorted(oracles):
        fn = registry[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        cold = time.time() - t0
        warms = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            warms.append(time.time() - t0)
        ducks = []
        for _ in range(3):
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            ducks.append(time.time() - t0)
        rows.append(
            {
                "query": name,
                "spark_cold": round(cold, 3),
                "spark_warm": round(min(warms), 3),
                "duckdb": round(min(ducks), 3),
            }
        )

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(rows),
        "spark_cold_total": round(sum(r["spark_cold"] for r in rows), 2),
        "spark_warm_total": round(sum(r["spark_warm"] for r in rows), 2),
        "duckdb_total": round(sum(r["duckdb"] for r in rows), 2),
        "widest_warm_gaps": sorted(
            rows, key=lambda r: r["spark_warm"] - r["duckdb"], reverse=True
        )[:top_n],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
