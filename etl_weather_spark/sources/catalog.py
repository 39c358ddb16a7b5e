"""Multi-table catalog: ATOMIC cross-table snapshot commits.

Per-table snapshots (sources/snapshots.py) make each table individually
consistent, but a training run reads SEVERAL tables — documents,
embeddings, labels — and a writer updating them one at a time exposes
readers to a torn state (new docs, old embeddings). The fix is one more
level of the same pointer trick:

    catalog/
      _versions/v{N}.json     {table_name: {"path": ..., "version": V}}
      _latest                 text file "N" — THE commit point

- COMMIT: land every table as a new per-table snapshot version (their
  own pointers advance, but catalog readers never consult them), then
  write catalog manifest v{N+1} and atomically swap the catalog
  pointer. A crash ANYWHERE before the swap leaves catalog readers on
  the old, mutually-consistent set — partially-written table versions
  are just unreferenced garbage.
- READ: resolve the catalog version once (or pin an explicit version —
  cross-table time travel), then read each table AT ITS PINNED
  VERSION. Every table a reader touches comes from the same commit.

This is the catalog-level atomicity Iceberg gets from a metastore
transaction and Delta from the _last_checkpoint protocol — here it is
one ``os.replace`` on local disk (conditional PUT on object stores).

Scale: the catalog manifest is a few hundred bytes regardless of data
size; commit cost is the per-table snapshot writes, which are the
writes you were doing anyway.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from etl_weather_spark.sources.snapshots import snapshot_read, snapshot_write

__all__ = [
    "catalog_commit_tables",
    "catalog_current",
    "catalog_read",
    "catalog_versions",
]


def _vdir(catalog: str) -> str:
    return os.path.join(catalog, "_versions")


def _pointer(catalog: str) -> str:
    return os.path.join(catalog, "_latest")


def catalog_current(catalog: str) -> int | None:
    try:
        with open(_pointer(catalog)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _load(catalog: str, version: int) -> dict:
    with open(os.path.join(_vdir(catalog), f"v{version}.json")) as f:
        return json.load(f)


def catalog_versions(catalog: str, *, version: int | None = None) -> dict:
    """{table_name: {"path":…, "version":…}} pinned by one commit."""
    if version is None:
        version = catalog_current(catalog)
    if version is None:
        raise FileNotFoundError(f"no committed catalog version at {catalog}")
    return _load(catalog, version)


def catalog_commit_tables(
    spark: SparkSession,
    catalog: str,
    writes: dict[str, DataFrame],
    *,
    table_root: str | None = None,
    mode: str = "overwrite",
) -> int:
    """Commit a set of table updates as ONE atomic catalog version.

    ``writes`` maps table name → DataFrame. Unmentioned tables carry
    over at their previously-pinned versions. Each table lands as a
    normal per-table snapshot first (crash-safe garbage if we die),
    and the single catalog pointer swap at the end is the only commit
    point.
    """
    table_root = table_root or os.path.join(catalog, "tables")
    prev = catalog_current(catalog)
    pinned = dict(_load(catalog, prev)) if prev is not None else {}

    for name, df in writes.items():
        path = pinned.get(name, {}).get("path") or os.path.join(table_root, name)
        v = snapshot_write(df, path, mode=mode)
        pinned[name] = {"path": path, "version": v}

    version = 0 if prev is None else prev + 1
    os.makedirs(_vdir(catalog), exist_ok=True)
    with open(os.path.join(_vdir(catalog), f"v{version}.json"), "w") as f:
        json.dump(pinned, f)
    tmp = _pointer(catalog) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _pointer(catalog))  # the commit point
    return version


def catalog_read(
    spark: SparkSession,
    catalog: str,
    table: str,
    *,
    catalog_version: int | None = None,
) -> DataFrame:
    """Read ``table`` at the version pinned by one catalog commit —
    every table read through the same ``catalog_version`` is mutually
    consistent, regardless of in-flight writers."""
    pin = catalog_versions(catalog, version=catalog_version)[table]
    return snapshot_read(spark, pin["path"], version=pin["version"])
