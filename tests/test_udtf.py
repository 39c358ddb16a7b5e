"""Python UDTF surface: tokenize + hourly-explode table functions."""

from __future__ import annotations

import json

from etl_weather_spark.functions.table_functions import register_udtfs


def test_tokenize_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Hello, World! hello"), (2, None), (3, "")],
        "doc_id long, text string",
    ).createOrReplaceTempView("t_docs")
    rows = spark.sql(
        "SELECT t.* FROM t_docs, LATERAL tokenize(doc_id, text) t ORDER BY doc_id, pos"
    ).collect()
    assert [(r.doc_id, r.pos, r.word) for r in rows] == [
        (1, 0, "hello"), (1, 1, "world"), (1, 2, "hello"),
    ]


def test_hourly_explode_null_padding(spark):
    register_udtfs(spark)
    doc = json.dumps({
        "hourly": {
            "time": ["2025-01-01T00:00", "2025-01-01T01:00", "2025-01-01T02:00"],
            "temperature_2m": [25.0, 26.5, 24.0],
            # precipitation missing entirely → null-padded (P1 tolerance)
        }
    })
    spark.createDataFrame([(doc,)], "doc string").createOrReplaceTempView("t_raw")
    rows = spark.sql(
        "SELECT h.* FROM t_raw, LATERAL hourly_explode(doc) h ORDER BY time"
    ).collect()
    assert len(rows) == 3
    assert rows[1].temperature_2m == 26.5
    assert all(r.precipitation is None for r in rows)

    # length-mismatched array also null-pads instead of misaligning
    doc2 = json.dumps({
        "hourly": {"time": ["a", "b"], "temperature_2m": [1.0],
                   "precipitation": [0.0, 0.1]}
    })
    spark.createDataFrame([(doc2,)], "doc string").createOrReplaceTempView("t_raw2")
    rows2 = spark.sql("SELECT h.* FROM t_raw2, LATERAL hourly_explode(doc) h").collect()
    assert all(r.temperature_2m is None for r in rows2)
    assert [r.precipitation for r in rows2] == [0.0, 0.1]
