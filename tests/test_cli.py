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


def test_cli_maintain_roundtrip(spark, tmp_path, capsys):
    from etl_weather_spark.cli import main
    from etl_weather_spark.sources.snapshots import snapshot_read, snapshot_write

    table = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "good")], "k long, v string"), table)
    snapshot_write(spark.createDataFrame([(1, "BAD")], "k long, v string"), table)

    assert main(["maintain", "history", table]) == 0
    out = capsys.readouterr().out
    assert '"version": 0' in out and '"version": 1' in out

    assert main(["maintain", "rollback", table, "--to-version", "0"]) == 0
    assert [tuple(r) for r in snapshot_read(spark, table).collect()] == [(1, "good")]

    assert main(["maintain", "expire", table, "--keep-last", "1"]) == 0
    assert "expired versions: [0, 1]" in capsys.readouterr().out
    assert [tuple(r) for r in snapshot_read(spark, table).collect()] == [(1, "good")]


def test_cli_datasheet(sf_dir, tmp_path, capsys):
    out = str(tmp_path / "card.md")
    rc = main(["--sf-dir", sf_dir, "datasheet", "--near-dups", "--out", out])
    assert rc == 0
    card = open(out).read()
    assert "# Dataset card" in card
    assert "exact-dup rate" in card
    assert "## Language mix" in card
    assert "## Near-duplicates" in card
    # the card always carries the release section — either the pinned
    # release id or an explicit "none published" line
    assert "## Committed artifact release" in card
    assert ("release: **v" in card) or ("none published" in card)
    # stdout path too
    rc = main(["--sf-dir", sf_dir, "datasheet"])
    assert rc == 0
    assert "# Dataset card" in capsys.readouterr().out


def test_cli_explain(sf_dir, capsys):
    rc = main(["--sf-dir", sf_dir, "explain", "pricing_summary"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PushedFilters" in out or "Physical Plan" in out
    assert main(["--sf-dir", sf_dir, "explain", "nope"]) == 2


def test_cli_model_publish_show_history_and_stale_refusal(
    spark, sf_dir, tmp_path, monkeypatch, capsys
):
    """model publish commits once; show is a STRICT read (refuses a
    fingerprint-stale model with rc=3); history lists versions."""
    import json
    import os
    import shutil

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "artifacts"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", corpus / "documents.parquet")

    rc = main(["--sf-dir", str(corpus), "model", "publish"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(line) for line in out]
    # 9 trajectory rows + 1 meta line
    assert sum(1 for r in rows if "round" in r) == 9
    assert rows[-1]["name"] == "quality_classifier"

    assert main(["--sf-dir", str(corpus), "model", "show"]) == 0
    capsys.readouterr()
    assert main(["--sf-dir", str(corpus), "model", "history"]) == 0
    hist = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert [h["version"] for h in hist] == [0]

    # corpus changes -> strict show REFUSES (the audit contract)
    os.utime(corpus / "documents.parquet")
    rc = main(["--sf-dir", str(corpus), "model", "show"])
    assert rc == 3
    assert "REFUSED" in capsys.readouterr().err

    # publish again -> new version, show works again
    assert main(["--sf-dir", str(corpus), "model", "publish"]) == 0
    capsys.readouterr()
    assert main(["--sf-dir", str(corpus), "model", "show"]) == 0


def test_cli_artifacts_lifecycle(spark, sf_dir, tmp_path, monkeypatch, capsys):
    """artifacts release-publish pins the atomic corpus release;
    release-show surfaces the release id + pins (REFUSES when none);
    list inventories the registry; gc keeps the pinned release and
    reports what it dropped."""
    import json
    import os
    import shutil

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path / "artifacts"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", corpus / "documents.parquet")

    # no release yet -> strict refusal
    assert main(["--sf-dir", str(corpus), "artifacts", "release-show"]) == 3
    assert "REFUSED" in capsys.readouterr().err

    assert main(["--sf-dir", str(corpus), "artifacts", "release-publish"]) == 0
    pub = json.loads(capsys.readouterr().out)
    assert pub["released"] == 0
    assert set(pub["pins"]) == {
        "bpe_merges", "dedup_cc_membership", "quality_classifier",
    }

    assert main(["--sf-dir", str(corpus), "artifacts", "release-show"]) == 0
    rel = json.loads(capsys.readouterr().out)
    assert rel["version"] == 0 and rel["data_fingerprint"]

    assert main(["artifacts", "list"]) == 0
    rows = [json.loads(s) for s in capsys.readouterr().out.splitlines()]
    assert {"bpe_merges", "dedup_cc_membership", "quality_classifier"} <= {
        r["name"] for r in rows
    }

    assert main(["artifacts", "gc", "--keep-last", "1"]) == 0
    gc = json.loads(capsys.readouterr().out)
    assert gc == {"expired": {}, "kept_pinned": {}}  # fresh registry: no-op

    # release still readable after gc
    assert main(["--sf-dir", str(corpus), "artifacts", "release-show"]) == 0
    capsys.readouterr()

    # single release -> diff refuses; after a corpus change + republish,
    # diff reports per-artifact pin movement
    assert main(["--sf-dir", str(corpus), "artifacts", "release-diff"]) == 3
    assert "REFUSED" in capsys.readouterr().err
    os.utime(corpus / "documents.parquet")
    assert main(["--sf-dir", str(corpus), "artifacts", "release-publish"]) == 0
    capsys.readouterr()
    assert main(["--sf-dir", str(corpus), "artifacts", "release-diff"]) == 0
    rows = [json.loads(s) for s in capsys.readouterr().out.splitlines()]
    assert {r["artifact"] for r in rows} == {
        "bpe_merges", "dedup_cc_membership", "quality_classifier",
    }
    # same corpus bytes (only mtime changed) -> content identical, pins moved
    assert all(r["pin_moved"] and r["added"] == 0 and r["removed"] == 0
               for r in rows)
