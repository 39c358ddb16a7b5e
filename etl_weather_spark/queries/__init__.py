"""Query registry: every implemented operator as a named (Spark, oracle-SQL) pair.

This is the driver contract surface (``__spark_entry__.py`` re-exports
it). Each entry maps a SURVEY.md §2 operator (or a beyond-reference
training-data op) onto the driver's synthetic tables:

- ``events(ts, user_id, event_type, value, props)`` plays the hourly
  weather table (timestamp grain, numeric metric, categorical code) —
  FIXTURES.md §3 mapping.
- the TPC-H-ish star schema exercises joins/aggs/set-ops at scale.
- ``documents`` / ``embeddings`` carry the text-analysis and
  similarity operators.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name and
hash-compares values).

Determinism discipline: every float output is rounded; every top-k has a
total tie-break order; sums that feed comparisons go through rounding so
accumulation order (Spark partial aggs vs DuckDB) cannot flip the hash.

This package is the split of the former single-file queries.py
(domain modules listed in _MODULES); every top-level name of the
monolith is hoisted here so `etl_weather_spark.queries.<name>`
keeps working for the driver, tests, cli, serve and streaming.
"""

from etl_weather_spark.queries import (
    _registry,
    relational,
    text,
    dedup,
    similarity,
    media,
    governance,
    sampling,
    training,
)

_MODULES = (_registry, relational, text, dedup, similarity, media, governance, sampling, training)

for _m in _MODULES:
    for _k, _v in vars(_m).items():
        if not _k.startswith('__'):
            globals()[_k] = _v
del _k, _v, _m
