#!/usr/bin/env python
"""Round-11 streaming re-baseline (VERDICT r10 #7): run the bench's own
windowed-aggregation rate pipeline on a quiet window, print the achieved
rates, and dump the executed micro-batch plan to
plans/r11/streaming_windowed_plan.txt. Streaming code has zero diff this
round — this documents that the surface was examined and re-baselined.

    python scripts/bench_streaming_baseline.py [n_runs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from etl_weather_spark.session import get_spark


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="streaming-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    rates = [bench._streaming_windowed_rate(spark) for _ in range(n_runs)]
    print(f"windowed rows/sec samples: {rates}  max={max(rates)}")

    # capture the executed plan of the same windowed agg for the record
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from etl_weather_spark.functions.rounding import dsum

    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500000")
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1000).alias("user_id"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )
    agg = (
        events.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute").alias("win"), "user_id")
        .agg(dsum("value").alias("vsum"), F.count(F.lit(1)).alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="stream_plan_ckpt_")
    q = (
        agg.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(processingTime="2 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and len(q.recentProgress) < 2:
            time.sleep(1)
        plan = q._jsq.explainInternal(True)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
        "streaming_windowed_plan.txt",
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
