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
    # hand-rolled on purpose (no argparse import cost in a timing tool),
    # but the token AFTER --runs is its value, not a query name
    # (ADVICE r8: `q --runs 7` used to emit {"query": "7", ...})
    argv = sys.argv[1:]
    args: list[str] = []
    runs = 5
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs = int(argv[i + 1])
            i += 2
            continue
        if not argv[i].startswith("--"):
            args.append(argv[i])
        i += 1
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
