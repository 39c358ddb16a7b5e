"""operators/frequent.heavy_hitters: exactness + the MG superset guarantee."""

from __future__ import annotations

import collections
import random

from etl_weather_spark.operators.frequent import heavy_hitters


def _exact(values, phi):
    import math

    n = len(values)
    thr = math.ceil(phi * n)
    c = collections.Counter(values)
    return sorted(
        ((k, v, n) for k, v in c.items() if v >= thr),
        key=lambda t: (-t[1], t[0]),
    )


def _got(spark, values, phi, parts, slack=1.0):
    df = spark.createDataFrame([(v,) for v in values], ["item"]).repartition(parts)
    return [
        (r["item"], r["n_occurrences"], r["total_n"])
        for r in heavy_hitters(df, phi=phi, slack=slack).collect()
    ]


def test_zipf_skew_matches_bruteforce(spark):
    rng = random.Random(7)
    # zipf-ish: item i with weight ~ 1/i over 2000 distinct items
    pop = [f"it{i}" for i in range(1, 2001)]
    wts = [1.0 / i for i in range(1, 2001)]
    values = rng.choices(pop, weights=wts, k=20_000)
    phi = 0.01  # k = 100 << 2000 distinct: the decrement path does real work
    assert _got(spark, values, phi, parts=8) == _exact(values, phi)


def test_output_is_partitioning_invariant(spark):
    rng = random.Random(11)
    values = [f"v{rng.randint(0, 500)}" for _ in range(5_000)] + ["hot"] * 400
    phi = 0.02
    a = _got(spark, values, phi, parts=1)
    b = _got(spark, values, phi, parts=13)
    assert a == b == _exact(values, phi)
    assert ("hot", 400, len(values)) in a


def test_uniform_no_heavy_items_is_empty(spark):
    values = [f"u{i}" for i in range(1000)]  # every count = 1
    assert _got(spark, values, 0.01, parts=4) == []


def test_null_items_ignored_and_empty_string_is_real(spark):
    values = ["", "", "", "x"]
    df = spark.createDataFrame(
        [(v,) for v in values] + [(None,)], "item string"
    ).repartition(3)
    got = [
        (r["item"], r["n_occurrences"], r["total_n"])
        for r in heavy_hitters(df, phi=0.5, slack=2.0).collect()
    ]
    assert got == [("", 3, 4)]  # null dropped from N, '' counted normally
