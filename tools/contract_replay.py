"""Replay the driver's correctness gate locally: run every queries()
entry on Spark at sf0.01 and its oracle_sql() in DuckDB, compare row
count, column names, and value hash (columns sorted by name, rows
sorted)."""
import hashlib, sys
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as entry
from sketchy_spark.session import get_spark

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark(master="local[8]", extra_conf={
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
})
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.sha256("\x1e".join(out).encode()).hexdigest()[:16]

qs = entry.queries()
oracles = entry.oracle_sql()
fails = []
for name, fn in qs.items():
    try:
        df = fn(spark, SF)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
    except Exception as e:
        fails.append(name); print(f"{name:28s} SPARK ERROR: {e}"); continue
    if name not in oracles:
        print(f"{name:28s} rows={len(rows):6d}  (no oracle, rows-only)")
        continue
    try:
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        fails.append(name); print(f"{name:28s} ORACLE ERROR: {e}"); continue
    ok_rows = len(rows) == len(orows)
    ok_cols = sorted(cols) == sorted(ocols)
    ok_hash = ok_cols and canon(rows, cols) == canon(orows, ocols)
    status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
    if status != "OK":
        fails.append(name)
    print(f"{name:28s} rows={len(rows):6d}/{len(orows):6d} cols={'Y' if ok_cols else 'N'} hash={'Y' if ok_hash else 'N'} {status}")
spark.stop()
print("FAILURES:", fails if fails else "none")
