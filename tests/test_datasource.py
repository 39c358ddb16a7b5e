"""Custom Python DataSource: openmeteo raw-JSON directory → hourly rows."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_weather_spark.sources.datasource import register

DOC = {
    "hourly": {
        "time": ["2025-01-01T00:00", "2025-01-01T01:00", "2025-01-02T00:00"],
        "temperature_2m": [25.0, 26.5, 24.0],
        "precipitation": [0.0, 0.1, 2.4],
        # pm2_5 length-mismatched → null-padded; others absent → null
        "pm2_5": [10.0],
    }
}


def test_openmeteo_datasource_reads_directory(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "bandung_weather.json").write_text(json.dumps(DOC))
    (raw / "jakarta_weather.json").write_text(json.dumps(DOC))

    register(spark)
    df = spark.read.format("openmeteo").load(str(raw))
    assert df.count() == 6  # 3 hours × 2 files
    assert set(df.columns) == {"city", "time", "temp", "rain", "rh", "wind", "pm25", "pm10"}
    assert {r.city for r in df.select("city").distinct().collect()} == {"bandung", "jakarta"}

    bd = df.filter(F.col("city") == "bandung").orderBy("time").collect()
    assert [r.temp for r in bd] == [25.0, 26.5, 24.0]
    assert [r.rain for r in bd] == [0.0, 0.1, 2.4]
    assert all(r.pm25 is None for r in bd)  # mismatched length nulled
    assert all(r.rh is None for r in bd)    # absent metric nulled

    # composes with the engine: daily aggregation straight off the source
    daily = (
        df.withColumn("date", F.to_date("time"))
        .groupBy("city", "date")
        .agg(F.min("temp").alias("tmin"), F.sum("rain").alias("rain"))
        .orderBy("city", "date")
        .collect()
    )
    assert daily[0].tmin == 25.0 and abs(daily[0].rain - 0.1) < 1e-9


def _land(raw, name, times):
    doc = {
        "hourly": {
            "time": times,
            "temperature_2m": [20.0 + i for i in range(len(times))],
            "precipitation": [0.0] * len(times),
        }
    }
    (raw / name).write_text(json.dumps(doc))


def test_openmeteo_stream_tails_landing_dir(spark, tmp_path):
    """The same format streams: offsets advance with newly-landed files,
    a second run with the same checkpoint reads ONLY the new files."""
    raw = tmp_path / "raw"
    raw.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _land(raw, "bandung_weather_001.json", ["2025-01-01T00:00", "2025-01-01T01:00"])

    register(spark)

    def run_once():
        q = (
            spark.readStream.format("openmeteo")
            .load(str(raw))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).collect()
    assert len(first) == 2
    assert {r.city for r in first} == {"bandung"}

    # two more documents land; the resumed stream picks up only those
    _land(raw, "bandung_weather_002.json", ["2025-01-01T02:00"])
    _land(raw, "jakarta_weather_001.json", ["2025-01-01T00:00"])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4  # 2 (old) + 1 + 1, no re-reads
    assert {r.city for r in rows} == {"bandung", "jakarta"}
    assert sorted(r.temp for r in rows) == [20.0, 20.0, 20.0, 21.0]
