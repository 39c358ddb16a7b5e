"""Custom Python DataSource (Spark ≥4.0): Open-Meteo raw-JSON reader.

The reference's extract stage (S1/S2/S6, fetch.py:46-82) lands
columnar-arrays JSON documents — ``{"hourly": {"time": [...],
"temperature_2m": [...], ...}}`` — one file per (city, fetch). This
DataSource exposes a directory of those documents as a proper Spark
relation with the normalization (P1) already applied: one ROW PER HOUR,
typed, null-padded for missing/mismatched metric arrays.

``spark.read.format("openmeteo").load(dir)`` then composes with the
whole engine (the silver pipeline consumes it directly) instead of a
bespoke pre-processing script.

Scale notes:
- one :class:`InputPartition` per file → file-parallel reads across
  executors; no driver-side parsing (the driver only lists the
  directory).
- the reader yields plain tuples; Spark batches them Arrow-side. For
  very large documents a RecordBatch-yielding reader would cut the
  per-row overhead, but raw fetch documents are ≤384 rows each
  (16-day × 24 h API bound, fetch.py:98-99).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

#: (json key, output column) — mirrors sources/openmeteo rename map
METRICS = [
    ("temperature_2m", "temp"),
    ("precipitation", "rain"),
    ("relative_humidity_2m", "rh"),
    ("wind_speed_10m", "wind"),
    ("pm2_5", "pm25"),
    ("pm10", "pm10"),
]

SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("time", T.StringType()),
        *[T.StructField(out, T.DoubleType()) for _, out in METRICS],
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, city: str) -> None:
        self.path = path
        self.city = city


class OpenMeteoReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("openmeteo source requires a path")

    def partitions(self) -> list[_FilePartition]:
        # one partition per document file; city slug = filename prefix
        # (the reference's `{slug}_weather.json` convention, fetch.py:100-105)
        parts = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                city = name.split("_")[0]
                parts.append(_FilePartition(os.path.join(self.dir, name), city))
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # P1 tolerance (missing/misaligned arrays null-pad) in _parse_doc
        return _parse_doc(partition.path, partition.city)


def _parse_doc(path: str, city: str) -> Iterator[tuple]:
    """Shared P1 normalization: one landed document → hourly tuples."""
    with open(path, encoding="utf-8") as fh:
        doc = json.load(fh)
    hourly = doc.get("hourly", {}) or {}
    times = hourly.get("time") or []
    cols = []
    for key, _ in METRICS:
        arr = hourly.get(key)
        if not isinstance(arr, list) or len(arr) != len(times):
            arr = [None] * len(times)
        cols.append(arr)
    for i, t in enumerate(times):
        yield (city, t, *[None if c[i] is None else float(c[i]) for c in cols])


class OpenMeteoStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of the landing directory (S1/S2 as a STREAM).

    The landing convention is append-only timestamped filenames
    (fetch.py:100-105's ``{slug}_weather_{ts}.json``), so the sorted
    file list only ever grows — an OFFSET is simply "how many files of
    that list have been consumed" (``{"n": k}``), which makes replay
    between committed offsets exact: ``readBetweenOffsets(a, b)``
    re-parses files[a..b) and yields the identical rows, the property
    Structured Streaming's WAL needs for failure recovery.

    Scale: a SimpleDataSourceStreamReader parses on the driver — right
    for a landing tail (documents are ≤384 rows each, API-bound) and
    exactly wrong for bulk history, which is the batch reader's job
    (one InputPartition per file, executor-parallel).
    """

    def __init__(self, options: dict) -> None:
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("openmeteo stream requires a path")

    def _files(self) -> list[str]:
        return sorted(n for n in os.listdir(self.dir) if n.endswith(".json"))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _rows(self, names: list[str]) -> list[tuple]:
        # a LIST, not a generator: the prefetch wrapper pickles the
        # batch it hands to executors, and landed documents are small
        # (≤384 rows each, API-bound)
        return [
            row
            for name in names
            for row in _parse_doc(os.path.join(self.dir, name), name.split("_")[0])
        ]

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        files = self._files()
        return self._rows(files[start["n"]:]), {"n": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._rows(self._files()[start["n"]:end["n"]])


class OpenMeteoDataSource(DataSource):
    """``spark.read.format("openmeteo")`` (batch) and
    ``spark.readStream.format("openmeteo")`` (landing tail) after
    :func:`register`."""

    @classmethod
    def name(cls) -> str:
        return "openmeteo"

    def schema(self) -> T.StructType:
        return SCHEMA

    def reader(self, schema: T.StructType) -> OpenMeteoReader:
        return OpenMeteoReader(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> OpenMeteoStreamReader:
        return OpenMeteoStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(OpenMeteoDataSource)
