"""Python UDTFs — the table-function surface (SURVEY.md §2.13 D4).

The reference's closest analogue is the columnar-arrays→rows
normalization (P1, `transform.py:18-29`): one input document expands to
many rows. Spark ≥3.5 exposes exactly that shape as a Python UDTF:
``eval`` yields zero-or-more rows per input row, usable from SQL via
``LATERAL`` join after ``spark.udtf.register``.

Scale notes:
- All UDTFs here are declared ``useArrow=True``: inputs/outputs move
  as Arrow batches (plans show ArrowEvalPythonUDTF, not the
  row-pickling BatchEvalPythonUDTF — asserted registry-wide in
  tests/test_plans.py). ``eval`` is still called per input row, but
  serialization — the usual Python-UDTF tax — is batched.
- Each class yields bounded row counts per input (hours per doc /
  tokens per doc), so the expansion is data-proportional, never
  driver-materialized.
- For hot paths prefer the native equivalents (``explode`` +
  ``arrays_zip``; ``split`` + ``explode``): those stay in codegen.
  The UDTF surface is for logic that genuinely needs imperative
  per-row expansion (the tolerant null-padding below).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.functions import udtf
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

#: tokenization rule shared with the DuckDB oracle in queries.word_freq:
#: lowercase, split on non-alphanumeric runs, drop empties
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


@udtf(returnType="doc_id bigint, pos int, word string", useArrow=True)
class TokenizeUDTF:
    """text → one row per token with position.

    SQL: ``SELECT t.* FROM documents, LATERAL tokenize(doc_id, text) t``.
    """

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        pos = 0
        for tok in _TOKEN_RE.split(text.lower()):
            if tok:
                yield doc_id, pos, tok
                pos += 1


@udtf(returnType="time string, temperature_2m double, precipitation double", useArrow=True)
class HourlyExplodeUDTF:
    """Open-Meteo columnar JSON document → one row per hour (P1,
    transform.py:18-29 as a table function).

    Tolerant like the reference's ``_safe_hourly_frame``: a missing or
    length-mismatched metric array null-pads to the length of ``time``.
    """

    FIELDS = ("temperature_2m", "precipitation")

    def eval(self, doc: str):
        if doc is None:
            return
        hourly = json.loads(doc).get("hourly", {})
        times = hourly.get("time") or []
        cols = []
        for f in self.FIELDS:
            arr = hourly.get(f)
            if not isinstance(arr, list) or len(arr) != len(times):
                arr = [None] * len(times)
            cols.append(arr)
        for row in zip(times, *cols):
            yield row


@dataclass
class _MeltResult(AnalyzeResult):
    """AnalyzeResult subclasses MUST be dataclasses — Spark rebuilds
    them with dataclasses.replace on the executor before handing the
    instance to the UDTF constructor."""

    numeric_cols: tuple = ()
    key_col: str = ""


@udtf(useArrow=True)
class MeltNumericUDTF:
    """POLYMORPHIC table function (Spark 4 analyze API): melt every
    numeric column of ANY input table into long format
    (row_key, col_name, value) — the column list is discovered from the
    table argument's schema at plan time, not hardcoded.

    SQL: ``SELECT * FROM melt_numeric(TABLE(SELECT ...))``. The first
    column is the row key (its type flows through to the output
    schema — analyze() builds the StructType per call site); remaining
    numeric columns melt, everything else is ignored.

    This is the dynamic-schema side of §2.13's UDTF surface: the static
    UDTFs above declare their schema in the decorator, this one computes
    it per invocation. For fixed column sets prefer native
    stack()/unpivot (queries.unpivot_daily) — codegen, no Python.
    """

    def __init__(self, analyze_result=None):
        self._res = analyze_result

    @staticmethod
    def analyze(t: AnalyzeArgument) -> AnalyzeResult:
        fields = t.dataType.fields
        numeric = tuple(
            f.name
            for f in fields[1:]
            if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.LongType, T.IntegerType))
        )
        schema = (
            T.StructType()
            .add("row_key", fields[0].dataType)
            .add("col_name", T.StringType())
            .add("value", T.DoubleType())
        )
        return _MeltResult(schema=schema, numeric_cols=numeric, key_col=fields[0].name)

    def eval(self, row):
        for c in self._res.numeric_cols:
            v = row[c]
            yield row[self._res.key_col], c, (float(v) if v is not None else None)


def register_udtfs(spark) -> None:
    """Register the table functions for SQL use."""
    spark.udtf.register("tokenize", TokenizeUDTF)
    spark.udtf.register("hourly_explode", HourlyExplodeUDTF)
    spark.udtf.register("melt_numeric", MeltNumericUDTF)
