"""Ad-hoc SQL surface: views register lazily, SQL == DataFrame plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_weather_spark.cli import main
from etl_weather_spark.queries import load
from etl_weather_spark.sql import TABLES, register_views, run_sql


def test_sql_matches_dataframe_api(spark, sf_dir):
    df_sql = run_sql(
        spark,
        sf_dir,
        """
        SELECT r.r_name AS region, COUNT(*) AS n_nations
        FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name
        """,
    )
    df_api = (
        load(spark, sf_dir, "nation")
        .join(
            load(spark, sf_dir, "region"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )
    assert sorted(map(tuple, df_sql.collect())) == sorted(
        map(tuple, df_api.collect())
    )


def test_sql_views_conform_events_timestamp(spark, sf_dir):
    # SQL callers must see the same µs-timestamp events schema as
    # queries.load (nanos-long parquet conformed inside the view)
    register_views(spark, sf_dir)
    row = spark.sql("SELECT MIN(ts) AS t FROM events").collect()[0]
    assert row.t.year >= 2000


def test_sql_registers_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    names = {r.viewName for r in spark.sql("SHOW VIEWS").collect()}
    assert set(TABLES) <= names


def test_cli_sql(sf_dir, capsys):
    rc = main(
        ["--sf-dir", sf_dir, "sql", "SELECT COUNT(*) AS n FROM lineitem"]
    )
    assert rc == 0
    assert "n" in capsys.readouterr().out
