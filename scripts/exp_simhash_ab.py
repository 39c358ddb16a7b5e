#!/usr/bin/env python
"""Round-11 A/B: Arrow kernel for simhash64_portable (VERDICT r10
"Next round" #4).

Incumbent: explode(tokens) -> md5 per token row -> groupBy(doc) with 64
inline nibble-decode conditional sums (one giant codegen aggregate +
a doc-keyed exchange of 64 vote columns).

Kernel: ONE ArrowEvalPython projection — the Catalyst-produced token
array in, struct(sig_hi, sig_lo) out. md5 in hashlib (same digest), the
64 bit-votes vectorized in numpy (nibble decode == _md5_bit_sql),
segment-summed per doc with np.add.reduceat. No explode, no vote
exchange, no 64-column aggregate codegen. Integer math end-to-end, so
bit-parity is by construction; asserted here over the full corpus.

    python scripts/exp_simhash_ab.py [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import etl_weather_spark.queries  # noqa: F401
from etl_weather_spark.operators.dedup import (
    simhash64_portable,
    simhash_band_pairs,
    tokens,
    widen_narrow_input,
)
from etl_weather_spark.operators.dedup import simhash64_portable_kernel
from etl_weather_spark.queries._registry import _QUERIES, load
from etl_weather_spark.session import get_spark


def near_dupes_kernel(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sigs = simhash64_portable_kernel(docs).localCheckpoint(eager=False)
    return simhash_band_pairs(sigs, hot_band_cap=64).orderBy("id_a", "id_b")


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="exp-simhash-ab")
    spark.sparkContext.setLogLevel("FATAL")
    load(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    # bit-parity over the FULL corpus first
    docs = load(spark, sf_dir, "documents")
    a = {
        r.doc_id: (r.sig_hi, r.sig_lo)
        for r in simhash64_portable(docs).collect()
    }
    b = {
        r.doc_id: (r.sig_hi, r.sig_lo)
        for r in simhash64_portable_kernel(docs).collect()
    }
    print(f"parity: {a == b} (n={len(a)} vs {len(b)})", flush=True)
    assert a == b

    variants = [
        ("A_incumbent", lambda s, d: _QUERIES["simhash_near_dupes"](s, d)),
        ("B_kernel", near_dupes_kernel),
    ]
    times: dict[str, list[float]] = {}
    for rnd_i in range(n_rounds):
        for vname, fn in variants:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            tot = round(t_build + t_exec, 3)
            times.setdefault(vname, []).append(tot)
            print(
                f"round {rnd_i} {vname}: build={t_build:.3f}s "
                f"exec={t_exec:.3f}s total={tot}s",
                flush=True,
            )
    ra = [tuple(r) for r in variants[0][1](spark, sf_dir).collect()]
    rb = [tuple(r) for r in near_dupes_kernel(spark, sf_dir).collect()]
    print(f"near_dupes rows equal: {ra == rb}")
    for vname, ts in times.items():
        print(f"{vname}: min={min(ts)} samples={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
