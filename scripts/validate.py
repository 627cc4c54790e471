#!/usr/bin/env python3
"""Driver-protocol validation sweep: run EVERY registered QuerySpec's
Spark side and DuckDB oracle on the same parquet tables with a vanilla
SparkSession (the driver's exact setup) and compare row count, schema,
and values.

Usage:
    python3 scripts/validate.py [sf_dir]      # default /root/testdata/sf0.01

Exit 0 = entry() runs and every oracle-paired spec matches bit-for-bit.
Rows-only specs (no SQL-expressible oracle) report their row counts and
are listed separately; any exception or mismatch fails the sweep.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import importlib.util

    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # vanilla session on purpose: the driver does NOT run get_spark()
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    print("entry rows:", mod.entry(spark).count())

    from crypto_data_ingestion_module_spark.plans.queries import (
        QUERY_SPECS,
        configure,
    )
    from tests.oracle_harness import compare_frames, duck_connection

    configure(spark)
    qs = mod.queries()
    con = duck_connection(sf_dir)
    checked = rows_only = failed = 0
    for name, s in sorted(QUERY_SPECS.items()):
        run = qs.get(name) or (lambda sp, d, _s=s: _s.spark(sp, d))
        if s.oracle is None:
            n = run(spark, sf_dir).count()
            print(f"  rows-only  {name}: {n} rows")
            rows_only += 1
            continue
        try:
            compare_frames(
                run(spark, sf_dir).toPandas(), con.sql(s.oracle).df(), name
            )
            checked += 1
        except Exception as e:  # keep sweeping; report all failures
            failed += 1
            print(f"  FAIL       {name}: {e}")
    print(
        f"oracle-matched {checked}, rows-only {rows_only}, failed {failed} "
        f"(of {len(QUERY_SPECS)} specs, {len(qs)} in the driver window) at {sf_dir}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
