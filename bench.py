#!/usr/bin/env python3
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Each query is forced end-to-end with the `noop` sink (full execution, no
driver-side collect overhead).  Wall-clock per query + total.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS  # noqa: E402
from crypto_data_ingestion_module_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: the flagship save-path query plus the heaviest relational
#: and extension operators. Falls back to "every registered query".
HEADLINE: tuple[str, ...] = ()


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in (HEADLINE or sorted(QUERY_SPECS)) if n in QUERY_SPECS]

    # Warm-up pass: JVM, Python workers, parquet footers, codegen caches.
    # Measured numbers are steady-state, as on a long-lived cluster.
    for name in names:
        QUERY_SPECS[name].spark(spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERY_SPECS[name].spark(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
