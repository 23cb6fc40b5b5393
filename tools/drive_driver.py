"""Simulate the driver: fresh SparkSession (driver's own config, NOT our
session factory), import __spark_entry__, smoke entry(), then run each
query vs its DuckDB oracle with an order-insensitive value hash.

Scale factor dir comes from $DRIVE_SF_DIR (default sf0.01 — the
driver's own scale); run with DRIVE_SF_DIR=/root/testdata/sf0.1 to
assert parity at bench scale too."""
import os, sys, hashlib
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

import __spark_entry__ as e

# t1 smoke
df = e.entry(spark)
rows = df.collect()
print(f"[t1] entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
print("     sample:", rows[:3])
assert len(rows) > 0

# t2 correctness (driver default sf0.01; override via DRIVE_SF_DIR)
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64").round(9).astype(str)
        else:
            pdf[c] = s.astype(str)
    rows = sorted(map("|".join, pdf.to_numpy().tolist()))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:12]

qs, os_ = e.queries(), e.oracle_sql()
fails = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF).toPandas()
    if name not in os_:
        print(f"[t2] {name}: rows-only, {len(sdf)} rows")
        continue
    ddf = con.execute(os_[name]).df()
    hs, hd = vhash(sdf), vhash(ddf)
    ok = (len(sdf) == len(ddf)) and hs == hd
    print(f"[t2] {name}: spark={len(sdf)} duck={len(ddf)} hash {'MATCH' if ok else 'MISMATCH '+hs+' vs '+hd}")
    fails += 0 if ok else 1
sys.exit(1 if fails else 0)
