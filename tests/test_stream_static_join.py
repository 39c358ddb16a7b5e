"""Stream-static dimension enrichment (streaming/stream_joins.enrich_stream)."""

from __future__ import annotations

from etl_weather_spark.streaming.stream_joins import enrich_stream

DIM_V1 = [(1, "bronze"), (2, "silver")]
DIM_V2 = [(1, "gold"), (2, "silver"), (3, "platinum")]


def _land(spark, src, rows, name):
    spark.createDataFrame(rows, "user_id long, amount long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/{name}")


def _write_dim(spark, dim_dir, rows):
    spark.createDataFrame(rows, "user_id long, tier string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(dim_dir)


def _drain(spark, src, dim_dir, ckpt, out_dir):
    feed = (
        spark.readStream.schema("user_id long, amount long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    dim = spark.read.parquet(dim_dir)
    q = (
        enrich_stream(feed, dim, "user_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user_id"], r["amount"]): r["tier"]
        for r in spark.read.parquet(out_dir).collect()
    }


def test_enrichment_and_dim_refresh_between_drains(spark, tmp_path):
    src = str(tmp_path / "facts")
    dim_dir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_dim(spark, dim_dir, DIM_V1)
    _land(spark, src, [(1, 100), (2, 200), (9, 50)], "b0")

    got = _drain(spark, src, dim_dir, ckpt, out)
    # left join: unknown user rides through with a null tier
    assert got == {(1, 100): "bronze", (2, 200): "silver", (9, 50): None}

    # dim updated + new facts land; a fresh drain resumes from the
    # checkpoint (reads ONLY the new file — earlier facts keep their
    # v1 enrichment) and the new micro-batch sees the NEW dim
    _write_dim(spark, dim_dir, DIM_V2)
    _land(spark, src, [(1, 101), (3, 300)], "b1")
    got2 = _drain(spark, src, dim_dir, ckpt, out)
    assert got2 == {
        (1, 100): "bronze", (2, 200): "silver", (9, 50): None,  # unchanged
        (1, 101): "gold", (3, 300): "platinum",                 # new dim
    }
