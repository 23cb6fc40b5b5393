"""Race every oracle-backed query: our Spark plan vs the DuckDB oracle
on the same parquet at $SPARK_GRAFT_SF_DIR (default sf0.1).  Prints a
per-query table with the ratio the driver's 2x target cares about
(BASELINE.md), worst first, then the totals.

DuckDB timing excludes view setup (shared); Spark timing excludes
session startup but includes full materialization via toPandas, the
same way bench.py and the driver measure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    only = sys.argv[1:]  # optional query-name filter

    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="bench-compare",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Same warmup as bench.py: codegen + shuffle + Arrow + worker pool.
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy("n_regionkey").count().toPandas()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

    rows = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        getattr(spark, "_smsp_plan_cache", {}).clear()  # full path per rep
        t0 = time.perf_counter()
        spdf = qs[name](spark, sf_dir).toPandas()
        t_spark = time.perf_counter() - t0
        if name in oracles:
            t0 = time.perf_counter()
            ddf = con.execute(oracles[name]).df()
            t_duck = time.perf_counter() - t0
            ratio = t_spark / max(t_duck, 1e-9)
        else:
            t_duck, ratio = float("nan"), float("nan")
        rows.append((name, t_spark, t_duck, ratio, len(spdf)))

    rows.sort(key=lambda r: -(r[3] if r[3] == r[3] else -1))
    print(f"{'query':28s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>8s} {'rows':>8s}")
    for name, ts, td, ratio, n in rows:
        print(f"{name:28s} {ts:8.3f} {td:8.3f} {ratio:8.1f} {n:8d}")
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows if r[2] == r[2])
    print(f"{'TOTAL':28s} {tot_s:8.2f} {tot_d:8.2f} {tot_s / max(tot_d, 1e-9):8.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
