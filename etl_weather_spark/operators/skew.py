"""Skew mitigation: salted joins and bucketed co-located joins.

At 100 TB a handful of hot keys (one viral document, one mega-customer)
can put 100× the median load on single shuffle partitions. Two
mitigations beyond AQE's automatic skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in
session.get_spark):

- :func:`salted_join` — explicit salting for when the skewed side is a
  FACT joined against a medium dimension that is too big to broadcast:
  the fact key gains a deterministic salt in [0, n_salts), the dim side
  replicates n_salts×, and the join key becomes (key, salt) — hot keys
  spread over n_salts partitions at the cost of replicating the dim.
- bucketed tables (``sources/lakehouse.write_bucketed``) — co-locate
  both sides of a recurring join at WRITE time; reads then sort-merge
  join with zero exchanges (asserted in tests/test_skew_bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
    entropy_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the left (skewed/fact) side salted.

    The salt must be DETERMINISTIC per row (a hash of payload columns,
    ``entropy_cols``), never ``rand()`` — task retries and speculative
    execution re-evaluate the expression, and a retried task that
    re-rolls its salt would route rows to a different partition than
    the shuffle files already written. Defaults to all non-key columns.

    Row-multiplicity semantics match a plain join for 'inner' and
    'left': each left row joins the single replicated copy of the right
    side that carries its salt.
    """
    entropy_cols = entropy_cols or [c for c in left.columns if c != on]
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in entropy_cols]), F.lit(n_salts))
    lt = left.withColumn("__salt", salt)
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lt.join(rt, on=[on, "__salt"], how=how).drop("__salt")
