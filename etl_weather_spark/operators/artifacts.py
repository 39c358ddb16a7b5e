"""Committed-artifact registry: train/compute ONCE, read everywhere.

A production pipeline does not re-run its trainer inside every audit
query — it trains, COMMITS the model (weights, centroids, membership
tables) to a registry, and every downstream consumer reads the
committed artifact. This module is that registry, built on the
snapshot layer (`sources/snapshots.py`, the same persistence the PQ
ANN index uses in `operators/ann_index.py`):

    <root>/<name>/<dataset_key>/
      data/<uuid>/part-*.parquet      (snapshot layer, immutable)
      _manifests/v{N}.json, _latest   (snapshot layer, atomic pointer)
      artifact_meta/v{N}.json         (this module: fingerprint + meta)

Staleness is a first-class failure: every publish records a DATASET
FINGERPRINT (content stat of the source tables + the producing
algorithm's parameters). :func:`read_artifact` REFUSES a missing
artifact (:class:`ArtifactMissingError`) or one whose fingerprint does
not match the data the caller is about to audit
(:class:`ArtifactStaleError`) — a model trained on yesterday's corpus
must never silently score today's. :func:`artifact_if_absent` is the
compute-if-absent wrapper the registered queries use: read when the
committed version is current, rebuild-and-commit (a NEW snapshot
version — history stays time-travelable) when it is missing or stale.

Scale: the artifacts committed here are dimension-sized (a 1-row
weight table, a 9-row trajectory, a per-doc membership or feature
relation written once) while their producers are Θ(rounds·N) training
chains or multi-round connected-components jobs — reading the
committed parquet replaces re-running the producer in every consumer,
which at 100 TB is the difference between one training pass and
eleven. Writers land data under fresh uuid dirs and swap an atomic
pointer, so concurrent publishers (two audits racing the first build)
both commit consistent versions and readers never see a partial one.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from etl_weather_spark.sources.snapshots import (
    current_version,
    snapshot_read,
    snapshot_write,
)

__all__ = [
    "ArtifactMissingError",
    "ArtifactStaleError",
    "artifact_if_absent",
    "artifact_meta",
    "artifact_table",
    "artifacts_root",
    "dataset_fingerprint",
    "dataset_key",
    "publish_artifact",
    "read_artifact",
]


class ArtifactMissingError(FileNotFoundError):
    """No committed version of the artifact exists."""


class ArtifactStaleError(RuntimeError):
    """The committed artifact was produced from different data or
    parameters than the caller is auditing (fingerprint skew)."""


def artifacts_root() -> str:
    """Registry root — env-overridable so tests stay hermetic."""
    env = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, "spark-warehouse", "artifacts")


def dataset_key(sf_dir: str) -> str:
    """Stable per-dataset registry key: basename + realpath hash (two
    different dirs named sf0.01 must not share a model)."""
    real = os.path.realpath(sf_dir)
    base = os.path.basename(real.rstrip("/")) or "root"
    return f"{base}-{hashlib.sha256(real.encode()).hexdigest()[:8]}"


def _stat_walk(path: str) -> Iterable[str]:
    """(relative-name, size, mtime_ns) lines for a file or directory —
    the cheap content proxy (no data read) the fingerprint hashes."""
    if os.path.isfile(path):
        st = os.stat(path)
        yield f".:{st.st_size}:{st.st_mtime_ns}"
        return
    for dirpath, _dirs, files in sorted(os.walk(path)):
        for f in sorted(files):
            st = os.stat(os.path.join(dirpath, f))
            rel = os.path.relpath(os.path.join(dirpath, f), path)
            yield f"{rel}:{st.st_size}:{st.st_mtime_ns}"


def dataset_fingerprint(
    sf_dir: str,
    tables: Iterable[str] = ("documents",),
    params: dict | None = None,
) -> str:
    """Fingerprint of (source tables, producer parameters): stat-level
    content identity of every parquet the producer read, plus the
    algorithm version/hyperparameters, so EITHER data or recipe
    changing makes the committed artifact stale."""
    h = hashlib.sha256()
    h.update(os.path.realpath(sf_dir).encode())
    for t in sorted(tables):
        p = os.path.join(sf_dir, f"{t}.parquet")
        h.update(f"\x00{t}\x00".encode())
        for line in _stat_walk(p):
            h.update(line.encode())
    if params:
        h.update(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()


def artifact_table(name: str, key: str) -> str:
    return os.path.join(artifacts_root(), name, key)


def _meta_path(table: str, version: int) -> str:
    return os.path.join(table, "artifact_meta", f"v{version}.json")


def artifact_meta(name: str, key: str, version: int | None = None) -> dict:
    """Committed metadata of a version (latest by default)."""
    table = artifact_table(name, key)
    if version is None:
        version = current_version(table)
    if version is None:
        raise ArtifactMissingError(f"no committed version of {name}/{key}")
    with open(_meta_path(table, version)) as f:
        return json.load(f)


def publish_artifact(
    df: DataFrame,
    name: str,
    key: str,
    *,
    fingerprint: str,
    meta: dict | None = None,
) -> int:
    """Commit ``df`` as the new current version of ``name``/``key``
    with its dataset fingerprint; returns the version. Old versions
    stay readable (snapshot history) — a registry keeps lineage."""
    table = artifact_table(name, key)
    os.makedirs(table, exist_ok=True)
    version = snapshot_write(df, table, mode="overwrite")
    record = {"fingerprint": fingerprint, "name": name, "key": key, **(meta or {})}
    os.makedirs(os.path.dirname(_meta_path(table, version)), exist_ok=True)
    tmp = _meta_path(table, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, _meta_path(table, version))
    return version


def read_artifact(
    spark: SparkSession,
    name: str,
    key: str,
    *,
    expect_fingerprint: str | None = None,
    version: int | None = None,
) -> DataFrame:
    """STRICT read: raises :class:`ArtifactMissingError` when nothing
    is committed, :class:`ArtifactStaleError` when the committed
    fingerprint differs from ``expect_fingerprint`` (the data or the
    recipe changed since training). Audits that must not run against
    a skewed model call this directly."""
    table = artifact_table(name, key)
    if version is None:
        version = current_version(table)
    if version is None:
        raise ArtifactMissingError(f"no committed version of {name}/{key}")
    meta = artifact_meta(name, key, version)
    if expect_fingerprint is not None and meta.get("fingerprint") != expect_fingerprint:
        raise ArtifactStaleError(
            f"artifact {name}/{key} v{version} was produced from "
            f"fingerprint {meta.get('fingerprint', '?')[:12]}…, caller "
            f"expects {expect_fingerprint[:12]}… — refusing to audit a "
            "stale model; re-publish first"
        )
    return snapshot_read(spark, table, version=version)


def artifact_if_absent(
    spark: SparkSession,
    name: str,
    key: str,
    *,
    fingerprint: str,
    build: Callable[[], DataFrame],
    meta: dict | None = None,
) -> DataFrame:
    """Compute-if-absent over the registry (the reference's M1
    ensure-then-serve semantics applied to models): read the committed
    version when its fingerprint is current; build + publish a new
    version when missing or stale, then read it back so every consumer
    — including the publisher itself — scans the same committed bytes.
    """
    try:
        return read_artifact(spark, name, key, expect_fingerprint=fingerprint)
    except (ArtifactMissingError, ArtifactStaleError):
        publish_artifact(build(), name, key, fingerprint=fingerprint, meta=meta)
        return read_artifact(spark, name, key, expect_fingerprint=fingerprint)
