"""Count-Min Sketch: mergeable frequency estimation under a fixed
memory budget (Cormode & Muthukrishnan, 2005).

The frequency sibling of the repo's distinct/quantile sketch tier
(HLL / KLL / theta, queries.py sketch rollups): a (depth × width)
integer matrix answers "how often did key k occur" with one-sided
error — estimate ≥ true always, estimate ≤ true + εN (ε = e/width)
with probability 1−δ (δ = e^−depth). Two CMS matrices over disjoint
data ADD element-wise to the CMS of the union, so per-day sketches
roll up to any range without rescanning raw events — the same
persistence story as the HLL/KLL rollups, for point frequencies.

Where Misra-Gries (operators/frequent.py) finds the heavy keys
EXACTLY with a recount pass, CMS answers ad-hoc point queries over
keys chosen AFTER the scan, from a fixed-size artifact.

Hashing reuses the Bloom module's BLAKE2b double-hashing
(Kirsch–Mitzenmacher): row d probes position (g1 + d·g2) mod width —
one hash per key for all depth rows, identical bytes on build and
probe sides.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_weather_spark.operators.bloom import _positions

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 5, width: int = 2048
) -> np.ndarray:
    """(depth, width) int64 count matrix over ``df[key_col]``.

    One distributed pass: each partition accumulates a local matrix
    (numpy scatter-add per Arrow batch) and emits the PARTIAL; the
    driver sums them. Driver traffic is n_partitions × depth·width·8
    bytes — never per-key rows.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.zeros((depth, width), dtype=np.int64)
        seen = False
        for pdf in batches:
            keys = pdf[key_col].dropna()
            if len(keys) == 0:
                continue
            seen = True
            pos = _positions(keys, width, depth)  # (B, depth)
            for d in range(depth):
                np.add.at(m[d], pos[:, d], 1)
        if seen:
            yield pd.DataFrame({"m": [m.tobytes()]})

    rows = (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .mapInPandas(partials, "m binary")
        .collect()
    )
    out = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        out += np.frombuffer(r.m, dtype=np.int64).reshape(depth, width)
    return out


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """CMS of the disjoint union = element-wise sum (the mergeability
    that makes stored per-day sketches roll up to any range)."""
    assert a.shape == b.shape, (a.shape, b.shape)
    return a + b


def cms_estimate(key: Column, cms: np.ndarray) -> Column:
    """Point-frequency estimate column: min over depth rows at the
    key's probe positions. Arrow-batched; the matrix rides in the UDF
    closure (broadcast with the task binary)."""
    from pyspark.sql.functions import pandas_udf

    depth, width = cms.shape
    m = cms

    @pandas_udf("long")
    def probe(keys: pd.Series) -> pd.Series:
        if len(keys) == 0:
            return pd.Series([], dtype="int64")
        pos = _positions(keys.fillna(""), width, depth)  # (B, depth)
        ests = np.min(
            np.stack([m[d, pos[:, d]] for d in range(depth)], axis=1), axis=1
        )
        # null keys never enter the build (dropna) — estimate 0, not
        # whatever cell str(None) happens to hash into
        ests = np.where(keys.notna().to_numpy(), ests, 0)
        return pd.Series(ests)

    return probe(key.cast("string"))
