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


def test_melt_numeric_polymorphic_schema(spark):
    """The analyze API must derive both the output key type and the
    melted column set from the TABLE argument — different inputs,
    different plans, no code change."""
    from etl_weather_spark.functions.table_functions import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, 10, 2.5, "skip"), (2, 20, None, "skip")],
        "id long, cnt long, x double, s string",
    ).createOrReplaceTempView("__melt_a")
    got = [
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM melt_numeric(TABLE(SELECT * FROM __melt_a)) ORDER BY row_key, col_name"
        ).collect()
    ]
    assert got == [
        (1, "cnt", 10.0), (1, "x", 2.5), (2, "cnt", 20.0), (2, "x", None),
    ]

    # a STRING-keyed table: the key type flows through to the schema
    spark.createDataFrame(
        [("a", 1.5)], "name string, metric double"
    ).createOrReplaceTempView("__melt_b")
    out = spark.sql("SELECT * FROM melt_numeric(TABLE(SELECT * FROM __melt_b))")
    assert dict(out.dtypes)["row_key"] == "string"
    assert [tuple(r) for r in out.collect()] == [("a", "metric", 1.5)]
