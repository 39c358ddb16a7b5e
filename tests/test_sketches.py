"""Count-Min Sketch semantics: one-sided error, mergeability,
partition invariance."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_weather_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _freqs(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "k string")


def test_cms_never_underestimates(spark):
    rows = [f"k{i % 37}" for i in range(1000)]  # k0..k36, ~27 each
    df = _freqs(spark, rows)
    cms = cms_build(df, "k", depth=5, width=256)
    true = {}
    for k in rows:
        true[k] = true.get(k, 0) + 1
    probe = spark.createDataFrame([(k,) for k in sorted(true)], "k string")
    got = {
        r.k: r.est
        for r in probe.withColumn("est", cms_estimate(F.col("k"), cms)).collect()
    }
    for k, n in true.items():
        assert got[k] >= n  # the hard CMS guarantee
        assert got[k] <= n + int(np.ceil(np.e / 256 * 1000))  # εN cap


def test_cms_exact_when_wide_enough(spark):
    # 10 keys in a 2048-wide sketch: collisions vanishingly unlikely
    rows = [f"key{i}" for i in range(10) for _ in range(i + 1)]
    df = _freqs(spark, rows)
    cms = cms_build(df, "k", depth=5, width=2048)
    probe = spark.createDataFrame([(f"key{i}",) for i in range(10)], "k string")
    got = {
        r.k: r.est
        for r in probe.withColumn("est", cms_estimate(F.col("k"), cms)).collect()
    }
    assert got == {f"key{i}": i + 1 for i in range(10)}


def test_cms_merge_equals_union_build(spark):
    a_rows = [f"u{i % 11}" for i in range(300)]
    b_rows = [f"u{i % 7}" for i in range(200)]
    a = cms_build(_freqs(spark, a_rows), "k", depth=4, width=128)
    b = cms_build(_freqs(spark, b_rows), "k", depth=4, width=128)
    both = cms_build(_freqs(spark, a_rows + b_rows), "k", depth=4, width=128)
    assert np.array_equal(cms_merge(a, b), both)


def test_cms_build_partition_invariant(spark):
    rows = [(f"v{i % 19}",) for i in range(500)]
    many = spark.createDataFrame(rows, "k string").repartition(13)
    one = spark.createDataFrame(rows, "k string").coalesce(1)
    assert np.array_equal(
        cms_build(many, "k", depth=5, width=256),
        cms_build(one, "k", depth=5, width=256),
    )
