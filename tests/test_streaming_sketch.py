"""Streaming CMS maintenance: per-batch partials, replay idempotence,
checkpoint resume (streaming/sketch_maintain)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_weather_spark.operators.sketches import cms_build, cms_estimate
from etl_weather_spark.streaming.sketch_maintain import (
    load_cms_state,
    process_cms_batch,
    stream_maintain_cms,
)

D, W = 5, 512


def _land(spark, src, keys, name):
    spark.createDataFrame([(k,) for k in keys], "k string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/{name}")


def _drain(spark, src, state, ckpt):
    feed = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = stream_maintain_cms(
        feed, state_path=state, checkpoint=ckpt, key_col="k", depth=D, width=W
    )
    assert q.awaitTermination(120), "stream did not finish in time"


def test_streaming_cms_equals_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "cms.npz")
    ckpt = str(tmp_path / "ckpt")
    b0 = [f"u{i % 5}" for i in range(100)]
    b1 = [f"u{i % 3}" for i in range(60)]
    _land(spark, src, b0, "b0")
    _land(spark, src, b1, "b1")

    _drain(spark, src, state, ckpt)
    m, applied = load_cms_state(state, depth=D, width=W)
    assert len(applied) == 2  # two micro-batches applied
    whole = cms_build(
        spark.createDataFrame([(k,) for k in b0 + b1], "k string"),
        "k", depth=D, width=W,
    )
    assert np.array_equal(m, whole)  # maintained artifact == batch build

    # the artifact answers point queries for everything seen so far
    probe = spark.createDataFrame([("u0",), ("u4",)], "k string")
    got = {
        r.k: r.est
        for r in probe.withColumn("est", cms_estimate(F.col("k"), m)).collect()
    }
    assert got["u0"] == b0.count("u0") + b1.count("u0")
    assert got["u4"] == b0.count("u4")

    # replaying an applied batch id is a no-op (at-least-once safety)
    process_cms_batch(
        spark.createDataFrame([(k,) for k in b0], "k string"),
        min(applied), state_path=state, key_col="k", depth=D, width=W,
    )
    m2, _ = load_cms_state(state, depth=D, width=W)
    assert np.array_equal(m2, m)

    # resume from checkpoint: only the NEW file is added
    b2 = [f"u{i % 2}" for i in range(40)]
    _land(spark, src, b2, "b2")
    _drain(spark, src, state, ckpt)
    m3, applied3 = load_cms_state(state, depth=D, width=W)
    assert len(applied3) == 3
    whole3 = cms_build(
        spark.createDataFrame([(k,) for k in b0 + b1 + b2], "k string"),
        "k", depth=D, width=W,
    )
    assert np.array_equal(m3, whole3)


def test_fresh_checkpoint_against_old_state_refuses(spark, tmp_path):
    # batch ids restart at 0 under a new checkpoint; silently reusing
    # the applied-id set would skip legitimate batches (ADVICE r2) —
    # the load must refuse instead
    import pytest

    src = str(tmp_path / "src")
    state = str(tmp_path / "cms.npz")
    _land(spark, src, ["a", "b"], "b0")
    _drain(spark, src, state, str(tmp_path / "ckpt1"))
    _land(spark, src, ["c", "d"], "b1")
    with pytest.raises(ValueError, match="lineage"):
        _drain_raise = stream_maintain_cms(
            spark.readStream.schema("k string").parquet(src + "/*"),
            state_path=state,
            checkpoint=str(tmp_path / "ckpt2"),  # FRESH checkpoint
            key_col="k",
            depth=D,
            width=W,
        )
        try:
            _drain_raise.awaitTermination(120)
        except Exception as ex:  # unwrap StreamingQueryException
            raise ValueError(str(ex)) from ex
