"""Local replica of the driver's correctness gate (sf0.01, plain session).

Type-aware since round 3: the driver's value hash is computed over *typed*
values, so a DuckDB HUGEINT (int128, e.g. from an uncast ``SUM(CASE ...)``)
hash-mismatches a Spark BIGINT even when the numbers are equal.  The round-2
replica stringified values and could not see that class of bug (VERDICT r2
"What's wrong" #1).  This version fetches the DuckDB result via ``.arrow()``
and maps Spark's schema onto the same canonical type names, flagging any
per-column skew as TYPESKEW (counted as mismatch).
"""
import math, os, sys, duckdb
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import types as T
import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

if ONLY is None:
    df = e.entry(spark)
    print(f"SMOKE: entry() -> {len(df.collect())} rows")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

EXACT = os.environ.get("VERIFY_6DP", "") == ""  # bit-exact by default


def canon_spark(dt):
    """Spark type -> canonical name comparable to canon_arrow()."""
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return dt.simpleString()


def canon_arrow(at):
    import pyarrow as pa
    if pa.types.is_int64(at):
        return "int64"
    if pa.types.is_int32(at):
        return "int32"
    if pa.types.is_int16(at):
        return "int16"
    if pa.types.is_int8(at):
        return "int8"
    if pa.types.is_float64(at):
        return "float64"
    if pa.types.is_float32(at):
        return "float32"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_decimal(at):
        return f"decimal({at.precision},{at.scale})"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"list<{canon_arrow(at.value_type)}>"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    return str(at)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if EXACT else f"{v:.6f}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


qs, oracles = e.queries(), e.oracle_sql()
ok = bad = weak = skew = 0
for name, fn in sorted(qs.items()):
    if ONLY is not None and name not in ONLY:
        continue
    try:
        sdf = fn(spark, SF)
        scols = sdf.columns
        stypes = {f.name: canon_spark(f.dataType) for f in sdf.schema.fields}
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as ex:
        print(f"  {name}: SPARK ERROR {str(ex)[:150]}"); bad += 1; continue
    if name not in oracles:
        print(f"  {name}: rows-only ({len(srows)} rows)"); weak += 1; continue
    try:
        res = con.execute(oracles[name])
        atbl = res.arrow()
        dcols = atbl.column_names
        dtypes = {f.name: canon_arrow(f.type) for f in atbl.schema}
        drows = list(zip(*[atbl.column(c).to_pylist() for c in dcols])) if dcols else []
        if not drows and atbl.num_rows:
            drows = [()] * atbl.num_rows
    except Exception as ex:
        print(f"  {name}: ORACLE ERROR {str(ex)[:150]}"); bad += 1; continue
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = sorted("|".join(norm(r[i]) for i in sidx) for r in srows)
    md = sorted("|".join(norm(r[i]) for i in didx) for r in drows)
    # Integer-width skew (int8/16/32 vs int64) is driver-proven benign:
    # r02 green rows include int32-vs-int64 columns (rank_pct_diff,
    # sorted_nations, doc_stats, ...).  HUGEINT→decimal(38,0) and any
    # other class is exactly what turned global_summary red.
    INTS = {"int8", "int16", "int32", "int64"}
    tmis = [
        (c, stypes.get(c), dtypes.get(c))
        for c in sorted(set(scols) | set(dcols))
        if stypes.get(c) != dtypes.get(c)
        and not ({stypes.get(c), dtypes.get(c)} <= INTS)
    ]
    if sorted(scols) == sorted(dcols) and ms == md and not tmis:
        ok += 1
        print(f"  {name}: MATCH ({len(srows)} rows)")
    elif sorted(scols) == sorted(dcols) and ms == md:
        skew += 1
        print(f"  {name}: TYPESKEW {tmis[:4]}")
    else:
        bad += 1
        diffs = [(a, b) for a, b in zip(ms, md) if a != b][:2]
        print(f"  {name}: MISMATCH cols_ok={sorted(scols)==sorted(dcols)} rows {len(srows)}/{len(drows)} {diffs} types={tmis[:4]}")
print(f"RESULT: {ok} match, {bad} mismatch, {skew} typeskew, {weak} rows-only")
