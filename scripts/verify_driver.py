"""Local replica of the driver's correctness gate (sf0.01, plain session)."""
import math, os, sys, duckdb
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
print(f"SMOKE: entry() -> {len(df.collect())} rows")

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

EXACT = os.environ.get("VERIFY_6DP", "") == ""  # bit-exact by default


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v) if EXACT else f"{v:.6f}"
    return v.isoformat() if hasattr(v, "isoformat") else str(v)

qs, oracles = e.queries(), e.oracle_sql()
ok = bad = weak = 0
for name, fn in sorted(qs.items()):
    try:
        sdf = fn(spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as ex:
        print(f"  {name}: SPARK ERROR {str(ex)[:150]}"); bad += 1; continue
    if name not in oracles:
        print(f"  {name}: rows-only ({len(srows)} rows)"); weak += 1; continue
    try:
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as ex:
        print(f"  {name}: ORACLE ERROR {str(ex)[:150]}"); bad += 1; continue
    sidx = sorted(range(len(scols)), key=lambda i: scols[i])
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
    ms = sorted("|".join(norm(r[i]) for i in sidx) for r in srows)
    md = sorted("|".join(norm(r[i]) for i in didx) for r in drows)
    if sorted(scols) == sorted(dcols) and ms == md:
        ok += 1
        print(f"  {name}: MATCH ({len(srows)} rows)")
    else:
        bad += 1
        diffs = [(a, b) for a, b in zip(ms, md) if a != b][:2]
        print(f"  {name}: MISMATCH cols_ok={sorted(scols)==sorted(dcols)} rows {len(srows)}/{len(drows)} {diffs}")
print(f"RESULT: {ok} match, {bad} mismatch, {weak} rows-only")
