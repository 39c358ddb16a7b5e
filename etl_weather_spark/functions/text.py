"""Text expressions: slugify, token counting, fingerprinting.

Reference parity: C1 slugify (utils.py:348-353). Everything except the
accent-strip stays JVM-side; the accent-strip (NFKD normalize) has no
Spark builtin, so :func:`slugify` uses a vectorized Pandas UDF for full
Unicode parity while :func:`slugify_ascii` is the pure-Catalyst fast path
for already-ASCII input.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def slugify_ascii(name: Column) -> Column:
    """lower, non-alnum runs → '-', trim '-', default 'city'.

    Pure Catalyst expression — use when input is known-ASCII (all the
    driver test tables are). Matches reference utils.py:348-353 minus the
    NFKD accent strip.
    """
    s = F.lower(name)
    s = F.regexp_replace(s, r"[^a-z0-9]+", "-")
    s = F.regexp_replace(s, r"^-+|-+$", "")
    return F.when(s == "", F.lit("city")).otherwise(s)


@pandas_udf(T.StringType())
def _strip_accents(s: pd.Series) -> pd.Series:
    """NFKD-normalize and drop combining marks ('São Paulo' → 'Sao Paulo')."""
    def strip(v: str | None) -> str | None:
        if v is None:
            return None
        norm = unicodedata.normalize("NFKD", v)
        return "".join(c for c in norm if not unicodedata.combining(c))

    return s.map(strip)


def slugify(name: Column) -> Column:
    """Full-parity slugify incl. accent strip (reference utils.py:348-353).

    Arrow-batched Pandas UDF for the NFKD step only; the rest is Catalyst.
    'São Paulo' → 'sao-paulo' (reference tests/test_utils.py:7).
    """
    return slugify_ascii(_strip_accents(name))


def token_count(text: Column) -> Column:
    """Whitespace token count — arithmetic form, no array materialization.

    ``len(trim(s)) - len(remove spaces) + 1`` avoids building a token
    array per row; at 100 TB that saves the memory of exploding every
    document. Empty/blank strings count 0.
    """
    t = F.trim(text)
    collapsed = F.regexp_replace(t, r"\s+", " ")
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(collapsed) - F.length(F.regexp_replace(collapsed, " ", "")) + 1
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Rough BPE-style token estimate: count word-piece-ish regex matches.

    Splits on word boundaries + punctuation, similar granularity to a BPE
    pre-tokenizer. JVM-side via regexp_count.
    """
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]"))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized, lowercased text.

    Used for exact-dup detection at scale: group/join on the 128-bit
    fingerprint instead of the full document body, so the dedup shuffle
    moves 32 bytes per doc, not the document.
    """
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


@pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG Pandas UDAF: geometric mean of positive values.

    The D3 surface (SURVEY §2.13): a custom aggregate the built-ins
    lack, Arrow-batched per group with partial states handled by Spark.
    exp(mean(ln x)) over positives; numerically stable in log space.
    """
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return float("nan")
    return float(np.exp(np.log(pos.astype("float64")).mean()))
