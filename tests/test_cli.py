"""CLI surface: daily write, report print, query dispatch."""

from __future__ import annotations

from etl_weather_spark.cli import main


def test_cli_daily_and_query(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "gold_daily")
    rc = main(["--sf-dir", sf_dir, "daily", "--out", out, "--partition"])
    assert rc == 0
    assert spark.read.parquet(out).count() > 0

    rc = main(["--sf-dir", sf_dir, "query", "sorted_nations", "--limit", "3"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "NATION_" in captured

    rc = main(["--sf-dir", sf_dir, "query", "nope"])
    assert rc == 2


def test_cli_report(sf_dir, capsys):
    rc = main(["--sf-dir", sf_dir, "report"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "period summary:" in out and "recommendations:" in out
