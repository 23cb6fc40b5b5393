"""Quick parity check for a subset of queries (args = names; default
all) at sf0.01 — same hash logic as tools/drive_driver.py but without
re-running everything.  Usage: python tools/parity_subset.py q1 q2 ..."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("parity-subset")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
names = sys.argv[1:] or sorted(qs)
fails = 0
for name in names:
    sdf = qs[name](spark, SF).toPandas()
    if name not in os_:
        print(f"{name}: rows-only, {len(sdf)} rows")
        continue
    ddf = con.execute(os_[name]).df()
    hs, hd = vhash(sdf), vhash(ddf)
    ok = (len(sdf) == len(ddf)) and hs == hd
    if not ok and sorted(sdf.columns) != sorted(ddf.columns):
        print(f"  cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
    print(f"{name}: spark={len(sdf)} duck={len(ddf)} {'MATCH' if ok else 'MISMATCH'}")
    fails += 0 if ok else 1
sys.exit(1 if fails else 0)
