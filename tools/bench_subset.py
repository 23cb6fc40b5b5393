"""Time a subset of queries at sf0.1 (min-of-3) against their DuckDB
oracles — the per-query feedback loop for performance work.
Usage: python tools/bench_subset.py q1 q2 ..."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_manifest_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="bench-subset",
    master=f"local[{CPUS}]",
    extra_confs={
        "spark.driver.memory": "24g",
        "spark.sql.shuffle.partitions": CPUS,
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

qs, oracles = e.queries(), e.oracle_sql()
names = sys.argv[1:]

# warm: parquet footers, codegen, python worker pool
spark.read.parquet(f"{SF}/nation.parquet").groupBy("n_regionkey").count().toPandas()
spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

import duckdb

con = duckdb.connect()
con.execute(f"PRAGMA threads={int(CPUS)}")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

for name in names:
    best = None
    for _ in range(3):
        getattr(spark, "_smsp_plan_cache", {}).clear()  # full path per rep
        t0 = time.perf_counter()
        qs[name](spark, SF).toPandas()
        best = min(best or 9e9, time.perf_counter() - t0)
    obest = None
    if name in oracles:
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetch_df()
            obest = min(obest or 9e9, time.perf_counter() - t0)
    ratio = f"{best/obest:.2f}x" if obest else "-"
    print(f"{name}: spark={best:.3f}s oracle={obest:.3f}s ratio={ratio}" if obest
          else f"{name}: spark={best:.3f}s (no oracle)")
