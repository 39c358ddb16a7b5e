#!/usr/bin/env python
"""Structured Streaming throughput benchmark.

Drives the engine's streaming operators with the built-in ``rate``
source (synthetic rows at a fixed rows/sec, no disk dependency) and
reports achieved throughput from Spark's own StreamingQueryProgress —
``processedRowsPerSecond`` is the scheduler's measurement, not a
wall-clock guess.

Two pipelines are measured:
- ``windowed``: watermark + tumbling 1-minute window agg (the streaming
  form of the daily spine, streaming/daily_stream.py) — stateful,
  shuffle per micro-batch.
- ``stateless``: projection + filter only — the per-row ceiling, so the
  windowed number can be read as "fraction of ceiling spent on state".

Usage: python scripts/bench_streaming.py [rows_per_sec] [seconds]
Prints one JSON line per pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_weather_spark.functions.rounding import dsum


def rate_events(spark: SparkSession, rows_per_sec: int) -> DataFrame:
    """rate source shaped like the events table (ts, user_id, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1000).alias("user_id"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )


def windowed(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute").alias("win"), "user_id")
        .agg(dsum("value").alias("vsum"), F.count(F.lit(1)).alias("n"))
    )


def stateless(events: DataFrame) -> DataFrame:
    return events.filter(F.col("value") > 5).select(
        "ts", "user_id", (F.col("value") * 2).alias("v2")
    )


def run(name: str, df: DataFrame, seconds: int) -> dict:
    ckpt = tempfile.mkdtemp(prefix=f"bench_stream_ckpt_{name}_")
    query = (
        df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update" if name == "windowed" else "append")
        .start()
    )
    try:
        time.sleep(seconds)
        progresses = [json.loads(p.json) for p in query.recentProgress]
    finally:
        query.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    # skip the first micro-batches (cold start: state store + codegen)
    rates = [
        p["processedRowsPerSecond"]
        for p in progresses[2:]
        if p.get("numInputRows", 0) > 0 and "processedRowsPerSecond" in p
    ]
    achieved = sum(rates) / len(rates) if rates else 0.0
    batch_ms = [
        p["durationMs"]["triggerExecution"]
        for p in progresses[2:]
        if "durationMs" in p and p.get("numInputRows", 0) > 0
    ]
    return {
        "pipeline": name,
        "processed_rows_per_sec": round(achieved),
        "micro_batches": len(rates),
        "avg_batch_ms": round(sum(batch_ms) / len(batch_ms)) if batch_ms else None,
    }


def main() -> None:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("etl-weather-spark-stream-bench")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, builder in [("stateless", stateless), ("windowed", windowed)]:
        df = builder(rate_events(spark, rows_per_sec))
        out = run(name, df, seconds)
        out["offered_rows_per_sec"] = rows_per_sec
        print(json.dumps(out))


if __name__ == "__main__":
    main()
