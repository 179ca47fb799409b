"""Simulate the driver: smoke entry() at sf0.001, then run each queries()[name]
vs oracle_sql()[name] through DuckDB at sf0.01 — the consumer protocol."""
import sys, json, math
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.session.timeZone","UTC")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
print("SMOKE entry():", len(rows), "rows; schema:", df.schema.simpleString()[:200])
assert len(rows) > 0

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def norm(v):
    # STRICT: int and float are different (driver hashes them differently;
    # DuckDB HUGEINT materializes as float on the driver's hash path).
    # Every branch returns a ("tag", ...) tuple so mixed None/str/num
    # columns stay totally ordered for the multiset sort (equality
    # semantics — what the driver hashes — are unchanged).
    if isinstance(v, bool): return ("b", v)
    if isinstance(v, float):
        if math.isnan(v): return ("s", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, int): return ("i", v)
    return ("n",) if v is None else ("s", str(v))

qs, oracles = e.queries(), e.oracle_sql()
ok = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, sf)
    scols = sorted(sdf.columns)
    srows = sorted(tuple(norm(r[c]) for c in scols) for r in sdf.collect())
    if name not in oracles:
        print(f"{name}: rows-only check, {len(srows)} rows"); continue
    rel = con.execute(oracles[name])
    dcols = sorted(d[0] for d in rel.description)
    draws = rel.fetchall()
    dmap = [d[0] for d in con.execute(oracles[name]).description]
    drows = sorted(tuple(norm(dict(zip(dmap,r))[c]) for c in dcols) for r in draws)
    match = scols == dcols and srows == drows
    print(f"{name}: cols={'OK' if scols==dcols else (scols,dcols)} rows={len(srows)}/{len(drows)} values={'MATCH' if match else 'MISMATCH'}")
    ok += match
print(f"{ok}/{len(oracles)} oracle matches")
spark.stop()
