#!/usr/bin/env python3
"""Capture `.explain("formatted")` output for registry queries into
plans/r{N}/<query>_<tag>.txt — the optimization-round evidence files
(the judge reads these instead of running Spark).

Usage:
    python3 scripts/capture_plans.py --round 17 --tag before [QUERY ...]

With no QUERY args, captures every DECLARED query (the driver window,
i.e. `__spark_entry__.queries()`).  Plans are rendered at
$SPARK_GRAFT_SF_DIR (default sf0.1) — plan shape only, MOSTLY no job
runs.  Known exceptions (documented per ADVICE r17 item 2): builders
whose declared plan depends on a size gate run a bounded eager action
at plan-BUILD time — `hashed_doc_similarity` counts its query docs off
the pruned parquet scan (and, below the bound, collects the bounded
query weights), `ann_graph_topk` counts the dense-id embeddings table;
streaming-machinery rows that must execute to produce their final
frame still run their drain at plan render if their builder demands it.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]
    rnd, tag, names = "17", "before", []
    i = 0
    while i < len(argv):
        if argv[i] == "--round":
            rnd = argv[i + 1]
            i += 2
        elif argv[i] == "--tag":
            tag = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    from crypto_data_ingestion_module_spark.plans.queries import (
        QUERY_SPECS,
        queries,
    )
    from crypto_data_ingestion_module_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not names:
        names = sorted(queries().keys())
    out_dir = os.path.join(REPO, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERY_SPECS[name].spark(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming rows can need a real run
            plan = f"(plan capture failed: {type(exc).__name__}: {exc})\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
