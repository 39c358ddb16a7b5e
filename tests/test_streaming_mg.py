"""Streaming Misra-Gries maintenance: per-batch merge bound, replay
idempotence, lineage guard (streaming/mg_maintain)."""

from __future__ import annotations

import pytest

from etl_weather_spark.streaming.mg_maintain import (
    load_mg_state,
    mg_merge_counts,
    process_mg_batch,
    stream_maintain_mg,
)

K = 8


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
    q = stream_maintain_mg(feed, state_path=state, checkpoint=ckpt, key_col="k", k=K)
    assert q.awaitTermination(120), "stream did not finish in time"


def test_mg_merge_bound_property():
    # decrement-merge keeps |counters| <= k and never OVER-counts
    a = {f"i{j}": 10 + j for j in range(K)}
    b = {f"j{j}": 5 for j in range(K)}
    out = mg_merge_counts(a, b, K)
    assert len(out) <= K
    for item, n in out.items():
        true = a.get(item, 0) + b.get(item, 0)
        assert n <= true


def test_streaming_mg_finds_heavy_hitters_and_replays_safely(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "mg.npz")
    ckpt = str(tmp_path / "ckpt")
    # two batches with one dominant key each + a long tail
    b0 = ["hot"] * 120 + [f"t{i}" for i in range(60)]
    b1 = ["hot"] * 80 + ["warm"] * 90 + [f"u{i}" for i in range(50)]
    _land(spark, src, b0, "b0")
    _land(spark, src, b1, "b1")
    _drain(spark, src, state, ckpt)

    counts, n_total, applied = load_mg_state(state)
    assert n_total == len(b0) + len(b1)
    assert len(applied) == 2 and len(counts) <= K
    # MG guarantee: true - N/(k+1) <= stored <= true for surviving items;
    # any item with true count > N/(k+1) MUST survive
    bound = n_total / (K + 1)
    truth = {"hot": 200, "warm": 90}
    for item, true in truth.items():
        assert true > bound
        assert item in counts, (item, counts)
        assert true - bound <= counts[item] <= true

    # replaying an applied batch id is a no-op
    process_mg_batch(
        spark.createDataFrame([(k,) for k in b0], "k string"),
        min(applied), state_path=state, key_col="k", k=K,
    )
    counts2, n2, _ = load_mg_state(state)
    assert counts2 == counts and n2 == n_total

    # resume: a third batch merges on top of the same lineage
    b2 = ["warm"] * 70 + [f"v{i}" for i in range(30)]
    _land(spark, src, b2, "b2")
    _drain(spark, src, state, ckpt)
    counts3, n3, applied3 = load_mg_state(state)
    assert n3 == n_total + len(b2) and len(applied3) == 3
    assert counts3["warm"] >= 160 - n3 / (K + 1)

    # fresh checkpoint against the old state refuses (lineage guard)
    with pytest.raises(ValueError, match="lineage"):
        load_mg_state(state, lineage=str(tmp_path / "ckpt2"))
