#!/usr/bin/env python
"""Skew-join mitigation benchmark: one hot key vs three strategies.

Synthesizes the 100 TB failure mode at local scale — a fact table with
90% of rows on ONE join key (4M rows, one 3.6M-row shuffle partition)
joined to a 50k-row dimension with broadcast disabled — and measures:

- ``plain``: AQE skew splitting OFF — the hot partition serializes the
  join behind one core (what happens on a cluster when mitigation is
  misconfigured: one straggler task, 99 idle executors).
- ``aqe``: spark.sql.adaptive.skewJoin.enabled=true (the engine default,
  session.get_spark) — AQE splits the oversized partition at runtime.
- ``salted``: operators/skew.salted_join — explicit deterministic
  salting, for when the skewed side meets a dim AQE can't split around
  (e.g. the dim side is the skewed one, or a non-shuffle join stage).

All three must return identical aggregates; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from etl_weather_spark.operators.skew import salted_join

N_FACT = 4_000_000
N_DIM = 50_000
HOT_KEY = 7


def make_session(skew_on: bool) -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"skew-bench-{skew_on}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def tables(spark: SparkSession):
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 10 < 9, HOT_KEY)
        .otherwise(F.col("id") % N_DIM)
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    return fact, dim


def timed(df) -> tuple[float, tuple]:
    t0 = time.time()
    row = df.agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    return time.time() - t0, (row["s"], row["n"])


def main() -> None:
    out: dict[str, float] = {}
    checks = set()

    spark = make_session(skew_on=False)
    fact, dim = tables(spark)
    t, chk = timed(fact.join(dim, "k"))
    out["plain_sec"] = round(t, 2)
    checks.add(chk)
    spark.stop()

    spark = make_session(skew_on=True)
    fact, dim = tables(spark)
    t, chk = timed(fact.join(dim, "k"))
    out["aqe_skew_split_sec"] = round(t, 2)
    checks.add(chk)

    t, chk = timed(salted_join(fact, dim, "k", n_salts=8))
    out["salted_join_sec"] = round(t, 2)
    checks.add(chk)
    spark.stop()

    assert len(checks) == 1, f"strategies disagree: {checks}"
    out["rows"] = N_FACT
    out["hot_key_share"] = 0.9
    print(json.dumps(out))


if __name__ == "__main__":
    main()
