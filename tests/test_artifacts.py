"""Committed-artifact registry (operators/artifacts.py): publish/read
roundtrip, compute-if-absent, and the staleness/refusal contract —
an audit must never silently run against a model trained on different
data or with a different recipe."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_weather_spark.operators.artifacts import (
    ArtifactMissingError,
    ArtifactStaleError,
    artifact_if_absent,
    artifact_meta,
    artifact_table,
    artifacts_root,
    dataset_fingerprint,
    dataset_key,
    publish_artifact,
    read_artifact,
)
from etl_weather_spark.sources.snapshots import current_version


@pytest.fixture()
def art_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", d)
    return d


def _one_row(spark, x=1.5):
    return spark.range(1).select(
        F.lit(x).alias("w"), F.lit("m").alias("tag")
    )


def test_root_env_override(art_dir):
    assert artifacts_root() == art_dir
    assert artifact_table("m", "k") == os.path.join(art_dir, "m", "k")


def test_publish_read_roundtrip(spark, art_dir):
    v = publish_artifact(
        _one_row(spark), "model", "ds", fingerprint="fp1", meta={"algo": "x"}
    )
    assert v == 0
    out = read_artifact(spark, "model", "ds", expect_fingerprint="fp1")
    row = out.collect()[0]
    assert (row.w, row.tag) == (1.5, "m")
    meta = artifact_meta("model", "ds")
    assert meta["fingerprint"] == "fp1"
    assert meta["algo"] == "x"


def test_missing_artifact_refused(spark, art_dir):
    with pytest.raises(ArtifactMissingError):
        read_artifact(spark, "model", "nope", expect_fingerprint="fp1")


def test_stale_artifact_refused(spark, art_dir):
    """The audit-refusal contract: a committed model whose fingerprint
    does not match the data/recipe the caller audits is an ERROR, not
    a silent stale read."""
    publish_artifact(_one_row(spark), "model", "ds", fingerprint="fp1")
    with pytest.raises(ArtifactStaleError, match="refusing"):
        read_artifact(spark, "model", "ds", expect_fingerprint="fp2")


def test_if_absent_builds_once_then_reads(spark, art_dir):
    calls = []

    def build():
        calls.append(1)
        return _one_row(spark)

    a = artifact_if_absent(
        spark, "model", "ds", fingerprint="fp1", build=build
    )
    b = artifact_if_absent(
        spark, "model", "ds", fingerprint="fp1", build=build
    )
    assert len(calls) == 1  # second call read the committed version
    assert a.collect() == b.collect()
    assert current_version(artifact_table("model", "ds")) == 0


def test_if_absent_rebuilds_on_stale_as_new_version(spark, art_dir):
    artifact_if_absent(
        spark, "model", "ds", fingerprint="fp1",
        build=lambda: _one_row(spark, 1.0),
    )
    out = artifact_if_absent(
        spark, "model", "ds", fingerprint="fp2",
        build=lambda: _one_row(spark, 2.0),
    )
    assert out.collect()[0].w == 2.0
    # re-publish is a NEW snapshot version; history stays readable
    assert current_version(artifact_table("model", "ds")) == 1
    old = read_artifact(spark, "model", "ds", version=0)
    assert old.collect()[0].w == 1.0


def test_fingerprint_tracks_data_and_params(tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    f = sf / "documents.parquet"
    f.write_bytes(b"abc")
    fp1 = dataset_fingerprint(str(sf), ("documents",), {"k": 1})
    assert fp1 == dataset_fingerprint(str(sf), ("documents",), {"k": 1})
    # param change -> new fingerprint
    assert fp1 != dataset_fingerprint(str(sf), ("documents",), {"k": 2})
    # data change (size or mtime) -> new fingerprint
    f.write_bytes(b"abcd")
    assert fp1 != dataset_fingerprint(str(sf), ("documents",), {"k": 1})


def test_dataset_key_distinguishes_same_basename(tmp_path):
    a = tmp_path / "x" / "sf0.01"
    b = tmp_path / "y" / "sf0.01"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    ka, kb = dataset_key(str(a)), dataset_key(str(b))
    assert ka != kb
    assert ka.startswith("sf0.01-") and kb.startswith("sf0.01-")


def test_committed_weights_equal_fresh_chain(spark, sf_dir, art_dir):
    """The registry read must be BIT-identical to retraining: the 6-dp
    decimal GD chain is deterministic, and parquet round-trips doubles
    exactly — this is what lets every audit's oracle keep unrolling
    the chain while the Spark side reads committed bytes."""
    from etl_weather_spark.queries import _qct_chain, _qct_weights

    committed = _qct_weights(spark, sf_dir).collect()[0].asDict()
    _chain, w = _qct_chain(spark, sf_dir)
    fresh = w.collect()[0].asDict()
    assert committed == fresh


def test_corpus_change_triggers_retrain(spark, tmp_path, art_dir):
    """End-to-end staleness: copy the corpus, publish, touch the
    parquet (mtime bump = new fingerprint), and the next read rebuilds
    as a new version instead of serving the stale model."""
    import shutil

    sf = tmp_path / "sfcopy"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet", sf / "documents.parquet")
    from etl_weather_spark.queries import _qct_trajectory

    _qct_trajectory(spark, str(sf))
    name_key = ("quality_classifier", dataset_key(str(sf)))
    assert current_version(artifact_table(*name_key)) == 0
    os.utime(sf / "documents.parquet")  # corpus "changed"
    _qct_trajectory(spark, str(sf))
    assert current_version(artifact_table(*name_key)) == 1
