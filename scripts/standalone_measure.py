#!/usr/bin/env python3
"""Standalone settled re-measure for individual queries (the PERF.md
receipt recipe): 2 warm-ups + System.gc + N noop-sink measured runs at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].

Usage:
    python3 scripts/standalone_measure.py QUERY [QUERY ...] [--runs N]

Prints per-query min/median/max over the measured runs as one JSON line
per query — the attributable number for any in-sweep flag (in-sweep
times carry 3-10x GC/codegen interference; these do not).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    if not args:
        print(__doc__)
        return 1

    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS
    from crypto_data_ingestion_module_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("standalone-measure")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERY_SPECS[name].spark(spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
        return round(time.perf_counter() - t0, 4)

    for name in args:
        if name not in QUERY_SPECS:
            print(json.dumps({"query": name, "error": "unknown query"}))
            continue
        for _ in range(2):  # warm-ups: codegen, footers, Python workers
            run(name)
        spark._jvm.System.gc()
        time.sleep(1.0)
        times = [run(name) for _ in range(runs)]
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "runs": times,
                    "min": min(times),
                    "median": round(statistics.median(times), 4),
                    "max": max(times),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
