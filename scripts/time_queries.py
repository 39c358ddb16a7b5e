#!/usr/bin/env python
"""Isolated per-query timing with the bench methodology (noop sink,
min of >=2 samples). Usage:

    python scripts/time_queries.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_weather_spark import queries as q
from etl_weather_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    registry["daily_agg"](spark, sf_dir).collect()  # warm-up
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _warm_fn(x):
        import numpy as np  # noqa: F401

        return pd.Series([[int(v)] for v in x])

    _warm = pandas_udf(_warm_fn, "array<long>")
    spark.range(0, 64, 1, 64).select(F.explode(_warm("id"))).collect()

    for name in names:
        fn = registry[name]
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(samples):.3f}s samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
