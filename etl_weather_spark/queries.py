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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_weather_spark.functions.categorize import (
    pm25_category,
    weather_code_desc,
    wind_compass,
)
from etl_weather_spark.functions.recommend import recommendation
from etl_weather_spark.functions.rounding import davg, dsum, rnd
from etl_weather_spark.functions.text import doc_fingerprint, slugify_ascii, token_count
from etl_weather_spark.operators.joins import asof_join_union
from etl_weather_spark.operators.windows import (
    centered_mean,
    minmax_normalize,
    pct_diff_vs_next,
    trailing_mean,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # runtime-settable; required so a caller-provided session (the
    # driver's) can read TIMESTAMP(NANOS) parquet (events.ts) at all
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # events.ts is TIMESTAMP(NANOS) in the source parquet; Spark reads it
    # as long nanos (see session.py nanosAsLong) — convert to µs
    # timestamps, truncating exactly like DuckDB's parquet reader does.
    from pyspark.sql import types as T

    if table == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer div — ts/1000 in double would lose µs precision
        # (int64 nanos exceed double's 53-bit mantissa)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Daily spine over events (SURVEY §2: P4, A1, C2, C4, C5, flags)
# ---------------------------------------------------------------------------

def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared daily aggregate over events: the weather daily-table analog.

    Scale: hash agg with map-side partials; shuffle carries one row per
    (date) per mapper. Timestamp→date is codegen'd; the parquet scan
    prunes to (ts, value).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("date"))
        .agg(
            rnd(F.min("value"), 2).alias("vmin"),
            rnd(F.max("value"), 2).alias("vmax"),
            rnd(F.coalesce(dsum("value"), F.lit(0.0)), 2).alias("vsum"),
            rnd(davg("value"), 2).alias("vavg"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS date,
       FLOOR((MIN(value)) * 100 + 0.5) / 100 AS vmin,
       FLOOR((MAX(value)) * 100 + 0.5) / 100 AS vmax,
       FLOOR((COALESCE(CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE), 0.0)) * 100 + 0.5) / 100 AS vsum,
       FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS vavg,
       COUNT(*) AS n
FROM events
GROUP BY CAST(ts AS DATE)
"""


@query("daily_agg", _DAILY_SQL)
def daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: group-by-day multi-agg with named outputs (transform.py:89-100)."""
    return _daily(spark, sf_dir)


@query(
    "daily_flags",
    f"""
WITH daily AS ({_DAILY_SQL})
SELECT date, vmin, vmax, vsum, vavg, n,
       CASE WHEN vavg IS NULL THEN 'Tidak diketahui'
            WHEN vavg <= 12.0 THEN 'Baik'
            WHEN vavg <= 35.4 THEN 'Sedang'
            WHEN vavg <= 55.4 THEN 'Tidak sehat (sensitif)'
            WHEN vavg <= 150.4 THEN 'Tidak sehat'
            WHEN vavg <= 250.4 THEN 'Sangat tidak sehat'
            ELSE 'Berbahaya' END AS category,
       (vmax > 33.0) AS is_hot_day,
       (vsum > 20.0) AS is_heavy_rain,
       (vavg > 35.4) AS is_unhealthy
FROM daily
""",
)
def daily_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 binning + derived boolean flags (transform.py:32-48, app.js:326-328)."""
    d = _daily(spark, sf_dir)
    return d.select(
        "*",
        pm25_category(F.col("vavg")).alias("category"),
        (F.col("vmax") > 33.0).alias("is_hot_day"),
        (F.col("vsum") > 20.0).alias("is_heavy_rain"),
        (F.col("vavg") > 35.4).alias("is_unhealthy"),
    )


@query(
    "hourly_outer_join",
    """
WITH w AS (
  SELECT date_trunc('hour', ts) AS hour, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS wavg, COUNT(*) AS wn
  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1
), a AS (
  SELECT date_trunc('hour', ts) AS hour, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS aavg, COUNT(*) AS an
  FROM events WHERE event_type IN ('error', 'purchase') GROUP BY 1
)
SELECT COALESCE(w.hour, a.hour) AS hour, w.wavg, w.wn, a.aavg, a.an
FROM w FULL OUTER JOIN a ON w.hour = a.hour
""",
)
def hourly_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: full-outer equi-join of two hourly sources on time (transform.py:77).

    Scale: both sides aggregate before the join (shuffle carries hourly
    rows, not raw events); the join keys on the hour bucket so AQE can
    coalesce post-shuffle partitions.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(rnd(davg("value"), 2).alias("wavg"), F.count(F.lit(1)).alias("wn"))
    )
    a = (
        ev.filter(F.col("event_type").isin("error", "purchase"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(rnd(davg("value"), 2).alias("aavg"), F.count(F.lit(1)).alias("an"))
    )
    return w.join(a, on="hour", how="outer")


@query(
    "global_summary",
    f"""
WITH daily AS ({_DAILY_SQL}),
s AS (
  SELECT FLOOR((MIN(vmin)) * 100 + 0.5) / 100 AS period_min,
         FLOOR((MAX(vmax)) * 100 + 0.5) / 100 AS period_max,
         FLOOR((CAST(SUM(CAST((vavg) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(vavg)) * 100 + 0.5) / 100 AS period_avg,
         SUM(CASE WHEN vsum > 0 THEN 1 ELSE 0 END) AS rainy_days,
         COUNT(*) AS n_days
  FROM daily
),
w AS (
  SELECT date AS wettest_date, vsum AS wettest_sum
  FROM daily ORDER BY vsum DESC, date LIMIT 1
)
SELECT s.*, w.wettest_date, w.wettest_sum FROM s CROSS JOIN w
""",
)
def global_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-A5: grand aggregates, count_if, max_by argmax (report.py:81-106)."""
    d = _daily(spark, sf_dir)
    s = d.agg(
        rnd(F.min("vmin"), 2).alias("period_min"),
        rnd(F.max("vmax"), 2).alias("period_max"),
        rnd(davg("vavg"), 2).alias("period_avg"),
        F.sum(F.when(F.col("vsum") > 0, 1).otherwise(0)).alias("rainy_days"),
        F.count(F.lit(1)).alias("n_days"),
    )
    # wettest day via deterministic top-1 (vsum desc, date) instead of
    # max_by, whose tie-breaking is engine-defined (A5 parity with a
    # total order; max_by itself is exercised in pipeline.summary_from_daily)
    w = (
        d.select(F.col("date").alias("wettest_date"), F.col("vsum").alias("wettest_sum"))
        .orderBy(F.col("wettest_sum").desc(), F.col("wettest_date"))
        .limit(1)
    )
    return s.crossJoin(w)


@query(
    "recommendation_text",
    f"""
WITH daily AS ({_DAILY_SQL}),
s AS (
  SELECT FLOOR((CAST(SUM(CAST((vavg) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(vavg)) * 100 + 0.5) / 100 AS period_avg, FLOOR((MAX(vmax)) * 100 + 0.5) / 100 AS period_max,
         SUM(CASE WHEN vsum > 0 THEN 1 ELSE 0 END) AS rainy_days
  FROM daily
)
SELECT period_avg, period_max, rainy_days,
       COALESCE(NULLIF(CONCAT_WS(' ',
         CASE WHEN period_avg > 55.4 THEN 'Kualitas udara buruk, gunakan masker saat keluar.'
              WHEN period_avg > 35.4 THEN 'Udara kurang baik untuk kelompok sensitif, pertimbangkan masker.'
              END,
         CASE WHEN period_max > 33.0 THEN 'Cuaca panas, minum air yang cukup.' END,
         CASE WHEN rainy_days >= 3 THEN 'Sering hujan, siapkan payung.' END), ''),
         'Kondisi cuaca dan udara relatif nyaman.') AS recommendation
FROM s
""",
)
def recommendation_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: threshold-triggered advice concat with default (report.py:28-49)."""
    d = _daily(spark, sf_dir)
    s = d.agg(
        rnd(davg("vavg"), 2).alias("period_avg"),
        rnd(F.max("vmax"), 2).alias("period_max"),
        F.sum(F.when(F.col("vsum") > 0, 1).otherwise(0)).alias("rainy_days"),
    )
    return s.select(
        "*",
        recommendation(
            F.col("period_avg"), F.col("period_max"), F.col("rainy_days")
        ).alias("recommendation"),
    )


# ---------------------------------------------------------------------------
# Window layer (W1-W4, A6, A8)
# ---------------------------------------------------------------------------

@query(
    "rolling_avg_7d",
    f"""
WITH daily AS ({_DAILY_SQL})
SELECT date, vsum,
       CASE WHEN COUNT(vsum) OVER w >= 7
            THEN FLOOR((CAST(SUM(CAST(vsum AS DECIMAL(28,2))) OVER w AS DOUBLE)
                        / COUNT(vsum) OVER w) * 100 + 0.5) / 100 END AS ma7
FROM daily
WINDOW w AS (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: trailing 7-day MA with pandas min_periods parity (viz.py:77).

    First 6 rows are null, matching pandas rolling(7).mean() defaults.
    Scale: the daily series is one row per day — tiny post-agg; on a
    per-city table this window is partitioned by city.
    """
    d = _daily(spark, sf_dir).select("date", "vsum")
    return trailing_mean(d, "vsum", "ma7", order_by="date", window=7, exact_scale=2)


@query(
    "centered_ma3",
    f"""
WITH et_daily AS (
  SELECT event_type, CAST(ts AS DATE) AS date, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS vavg
  FROM events GROUP BY 1, 2
)
SELECT event_type, date, vavg,
       FLOOR((CAST(SUM(CAST(vavg AS DECIMAL(28,2))) OVER win AS DOUBLE)
               / COUNT(vavg) OVER win) * 100 + 0.5) / 100 AS ma3
FROM et_daily
WINDOW win AS (PARTITION BY event_type ORDER BY date ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
""",
)
def centered_ma3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: centered window=3 smoothing per series (app.js:859-872)."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(rnd(davg("value"), 2).alias("vavg"))
    return centered_mean(d, "vavg", "ma3", order_by="date", partition_by=["event_type"], exact_scale=2)


@query(
    "minmax_norm",
    f"""
WITH et_daily AS (
  SELECT event_type, CAST(ts AS DATE) AS date, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS vavg
  FROM events GROUP BY 1, 2
)
SELECT event_type, date, vavg,
       FLOOR((CASE WHEN MAX(vavg) OVER w = MIN(vavg) OVER w THEN 1.0
             ELSE (vavg - MIN(vavg) OVER w) / (MAX(vavg) OVER w - MIN(vavg) OVER w)
             END) * 10000 + 0.5) / 10000 AS vnorm
FROM et_daily
WINDOW w AS (PARTITION BY event_type)
""",
)
def minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-group min-max normalization, zero-range→1 (app.js:851-857)."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("date")
    ).agg(rnd(davg("value"), 2).alias("vavg"))
    return minmax_normalize(d, "vavg", "vnorm", partition_by=["event_type"])


@query(
    "rank_pct_diff",
    """
WITH s AS (
  SELECT event_type, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS avg_value, FLOOR((MAX(value)) * 100 + 0.5) / 100 AS max_value
  FROM events GROUP BY event_type
), r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY avg_value DESC, event_type) AS rank
  FROM s
)
SELECT event_type, avg_value, max_value, rank,
       FLOOR(((avg_value - LEAD(avg_value) OVER (ORDER BY rank))
             / ABS(LEAD(avg_value) OVER (ORDER BY rank)) * 100.0) * 10 + 0.5) / 10 AS pct_diff_vs_next
FROM r
""",
)
def rank_pct_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+W4+A8: per-key summary, ranking, % diff vs next (app.js:874-883,975-986).

    Scale: ranking runs on the *aggregated* table (one row per key), so
    the unpartitioned window sees #keys rows, not raw data.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        rnd(davg("value"), 2).alias("avg_value"),
        rnd(F.max("value"), 2).alias("max_value"),
    )
    # deterministic tie-break on event_type to match the oracle exactly
    w = Window.orderBy(F.col("avg_value").desc(), F.col("event_type"))
    ranked = s.withColumn("rank", F.row_number().over(w))
    return pct_diff_vs_next(ranked, "avg_value", rank_col="rank")


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1-O6) and set ops (U1-U2), unpivot (V1-V2)
# ---------------------------------------------------------------------------

@query(
    "top5_days",
    f"""
WITH daily AS ({_DAILY_SQL})
SELECT date, vsum FROM daily
ORDER BY vsum DESC, date
LIMIT 5
""",
)
def top5_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/O6: top-k by metric with total tie-break order.

    Spark plans TakeOrderedAndProject — no global sort materialization.
    """
    return _daily(spark, sf_dir).select("date", "vsum").orderBy(
        F.col("vsum").desc(), F.col("date")
    ).limit(5)


@query(
    "union_dedup",
    """
SELECT DISTINCT name, nationkey, FLOOR((acctbal) * 100 + 0.5) / 100 AS acctbal FROM (
  SELECT c_name AS name, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT s_name AS name, s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
)
""",
)
def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: unionByName then distinct (web.py:559-560, utils.py:166-169).

    Scale: distinct is a shuffle on all columns — acceptable because the
    projected payload is 3 narrow columns, not whole rows.
    """
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s).withColumn("acctbal", rnd("acctbal", 2)).distinct()


@query(
    "unpivot_daily",
    f"""
WITH daily AS ({_DAILY_SQL})
SELECT date, 'vmin' AS metric, vmin AS value FROM daily
UNION ALL
SELECT date, 'vmax' AS metric, vmax AS value FROM daily
""",
)
def unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1/V2: wide→long unpivot for multi-series charts (app.js:478,928-947)."""
    return _daily(spark, sf_dir).unpivot(
        ids=["date"], values=["vmin", "vmax"], variableColumnName="metric", valueColumnName="value"
    )


# ---------------------------------------------------------------------------
# As-of join (J3)
# ---------------------------------------------------------------------------

@query(
    "asof_join",
    """
SELECT p.event_id, p.user_id, p.ts, FLOOR((p.value) * 100 + 0.5) / 100 AS purchase_value,
       FLOOR((c.value) * 100 + 0.5) / 100 AS value_asof
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: backward as-of join — each purchase gets the user's latest
    click value at or before its timestamp (app.js:755-761 generalized).

    Implementation: union+window carry-forward (operators/joins.py) —
    one shuffle on user_id, no pairwise explosion; survives 100 TB
    because the window partitions by the entity key.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", rnd("value", 2).alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value")
    )
    joined = asof_join_union(
        purchases, clicks, on="ts", by=["user_id"], value_cols=["value"]
    )
    return joined.select(
        "event_id", "user_id", "ts", "purchase_value", rnd("value_asof", 2).alias("value_asof")
    )


# ---------------------------------------------------------------------------
# Scalar-function parity (C1, C8, C9, C13)
# ---------------------------------------------------------------------------

@query(
    "slugify_parts",
    """
SELECT p_partkey,
       CASE WHEN s = '' THEN 'city' ELSE s END AS slug
FROM (
  SELECT p_partkey,
         regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g') AS s
  FROM part
)
""",
)
def slugify_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: slugify over part names (utils.py:348-353). ASCII fast path —
    the Unicode NFKD variant is the Pandas-UDF ``slugify`` (tested in
    tests/test_functions.py)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", slugify_ascii(F.col("p_name")).alias("slug"))


@query(
    "weather_code_decode",
    """
SELECT code, COUNT(*) AS n FROM (
  SELECT CASE
    WHEN k = 0 THEN 'Clear'
    WHEN k BETWEEN 1 AND 2 THEN 'Partly cloudy'
    WHEN k = 3 THEN 'Overcast'
    WHEN k BETWEEN 45 AND 48 THEN 'Fog'
    WHEN k BETWEEN 51 AND 57 THEN 'Drizzle'
    WHEN k BETWEEN 61 AND 67 THEN 'Rain'
    WHEN k BETWEEN 71 AND 77 THEN 'Snow'
    WHEN k BETWEEN 80 AND 82 THEN 'Rain showers'
    WHEN k BETWEEN 85 AND 86 THEN 'Snow showers'
    WHEN k BETWEEN 95 AND 99 THEN 'Thunderstorms'
    ELSE 'Unknown' END AS code
  FROM (SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k FROM events)
)
GROUP BY code
""",
)
def weather_code_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8+C13: tolerant JSON extraction (get_json_object) + WMO decode
    when-chain (app.js:169-185), aggregated to category counts."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(weather_code_desc(k).alias("code"))
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "wind_compass_bins",
    """
SELECT compass, COUNT(*) AS n FROM (
  SELECT (['N','NNE','NE','ENE','E','ESE','SE','SSE','S','SSW','SW','WSW','W','WNW','NW','NNW'])
         [(CAST(FLOOR((((value % 360) + 360) % 360 / 22.5) * 1 + 0.5) / 1 AS INT) % 16) + 1] AS compass
  FROM events
)
GROUP BY compass
""",
)
def wind_compass_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: degrees → 16-point compass label (app.js:187-194), as counts."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(wind_compass(F.col("value")).alias("compass"))
        .groupBy("compass")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "json_extract_props",
    """
SELECT event_type,
       FLOOR((AVG(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT))) * 100 + 0.5) / 100 AS k_avg,
       MAX(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT)) AS k_max
FROM events
GROUP BY event_type
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: JSON path extraction over a string column, then aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        rnd(F.avg(k), 2).alias("k_avg"), F.max(k).alias("k_max")
    )


# ---------------------------------------------------------------------------
# Star-schema relational coverage (J2, A1 at TPC-H shape)
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_qty,
       FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_base_price,
       FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_disc_price,
       FLOOR((CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_charge,
       FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
       FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
       FLOOR((CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan→filter→hash-agg.

    Scale: filter pushes to the parquet scan (PushedFilters on
    l_shipdate); the agg is map-side partial over 6 groups — shuffle is
    O(#groups × #mappers).
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(dsum("l_quantity"), 2).alias("sum_qty"),
            rnd(dsum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(dsum(disc_price, 6), 2).alias("sum_disc_price"),
            rnd(dsum(disc_price * (1 + F.col("l_tax")), 6), 2).alias("sum_charge"),
            rnd(davg("l_quantity"), 2).alias("avg_qty"),
            rnd(davg("l_extendedprice"), 2).alias("avg_price"),
            rnd(davg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_revenue_orders",
    """
SELECT o.o_orderkey, o.o_orderdate,
       FLOOR((CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → join → agg → top-k.

    Scale: customer (filtered) broadcasts; lineitem↔orders is the only
    shuffle join; top-k is TakeOrderedAndProject (no global sort).
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(rnd(dsum(rev, 6), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "revenue_by_nation",
    """
SELECT n.n_name,
       FLOOR((CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue,
       COUNT(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: broadcast the dimension chain, shuffle
    only the fact-fact join.

    Scale: region/nation/customer are broadcast (dims); orders↔lineitem
    is the single shuffle join on orderkey; the final agg groups on 25
    nations — map-side partials collapse it.
    """
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = F.broadcast(
        c.join(n, c["c_nationkey"] == n["n_nationkey"]).join(
            r, n["n_regionkey"] == r["r_regionkey"]
        )
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(dims, o["o_custkey"] == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            rnd(dsum(rev, 6), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "daily_left_join",
    """
WITH dw AS (
  SELECT CAST(ts AS DATE) AS date, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS wavg
  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1
), da AS (
  SELECT CAST(ts AS DATE) AS date, FLOOR((CAST(SUM(CAST((value) AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value)) * 100 + 0.5) / 100 AS aavg
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT dw.date, dw.wavg, da.aavg
FROM dw LEFT JOIN da ON dw.date = da.date
""",
)
def daily_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: daily weather ⟕ daily air averages on date (web.py:506)."""
    ev = load(spark, sf_dir, "events")
    dw = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.to_date("ts").alias("date"))
        .agg(rnd(davg("value"), 2).alias("wavg"))
    )
    da = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(rnd(davg("value"), 2).alias("aavg"))
    )
    return dw.join(da, on="date", how="left")


# ---------------------------------------------------------------------------
# Text analysis over documents (beyond-reference: SURVEY §7.1 step 9)
# ---------------------------------------------------------------------------

@query(
    "doc_stats",
    """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE length(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                 - length(replace(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ', '')) + 1
            END AS n_tokens,
       length(text) AS n_chars_actual,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
""",
)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token count (arithmetic, no array
    materialization) + md5 fingerprint per document."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    )


@query(
    "dedup_exact",
    """
SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
FROM (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
)
GROUP BY fingerprint
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on the 128-bit content fingerprint, keep min id.

    Scale: the shuffle moves (fingerprint, doc_id) pairs — 40 bytes per
    document regardless of document size. This is the 100 TB-safe shape
    of exact dedup.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )
