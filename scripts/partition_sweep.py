#!/usr/bin/env python3
"""Partitioning-independence sweep: every ORACLE-PAIRED query must
produce BIT-IDENTICAL results under different shuffle fan-outs.

The repo's parity discipline (micro-unit decimal sums, exact integer
recurrences, (value, id) tie-breaks) claims order-insensitivity; this
script proves it registry-wide by executing each paired query twice in
one session — spark.sql.shuffle.partitions=32 then =7 (odd, so hash
bucketing differs everywhere) — and comparing through the SAME
row-count + schema + value-hash harness the driver uses.  A query
whose output depends on partitioning (a nondeterministic tie, a
double sum accumulated in shuffle order) fails here before it can
flake in the driver.

Usage: python3 scripts/partition_sweep.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS
    from crypto_data_ingestion_module_spark.session import get_spark
    from tests.oracle_harness import compare_frames

    spark = get_spark("partition-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    failed, checked = [], 0
    for name, spec in sorted(QUERY_SPECS.items()):
        if spec.oracle is None:
            continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = spec.spark(spark, sf_dir).toPandas()
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = spec.spark(spark, sf_dir).toPandas()
            compare_frames(a, b, name)
            checked += 1
        except Exception as e:  # noqa: BLE001
            failed.append((name, str(e)[:160]))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    if failed:
        print(f"PARTITION-DEPENDENT RESULTS: {len(failed)}")
        for n, msg in failed:
            print(f"  {n}: {msg}")
        return 1
    print(
        f"all {checked} paired queries bit-identical at "
        f"shuffle.partitions 32 vs 7 ({sf_dir})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
