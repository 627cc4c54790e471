#!/usr/bin/env python3
"""Round-open ritual in one command (VERDICT r13 item 1: the COVERAGE
ledger must be regenerated from the INCOMING correctness file in the
round's FIRST commit, not remembered at session close).

Does three things, all read-only except COVERAGE.md:

1. regenerates COVERAGE.md via scripts/coverage_ledger.py (which reads
   every committed CORRECTNESS_r*.json plus the current window);
2. prints the incoming round's driver verdict summary (green / total);
3. prints the next-stalest paired receipt cohort — the rotation
   candidates for THIS round, oldest latest-receipt first.

Usage:
    python3 scripts/round_open.py [cohort_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    cohort_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    latest = max(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    rows = json.load(open(latest))
    green = sum(
        1
        for v in rows.values()
        if isinstance(v, dict)
        and not v.get("err")
        and all(v.get(k) for k in ("rows_match", "schema_match", "hash_match"))
    )
    print(f"incoming {os.path.basename(latest)}: {green}/{len(rows)} green")

    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "coverage_ledger.py")],
        check=True,
    )

    from scripts.coverage_ledger import driver_green_rounds

    from crypto_data_ingestion_module_spark.plans.queries import (
        CHECKED_QUERIES,
        QUERY_SPECS,
    )

    greens = driver_green_rounds()
    stale = sorted(
        (
            (max(greens.get(name, [0])), name)
            for name, spec in QUERY_SPECS.items()
            if spec.oracle is not None and name not in CHECKED_QUERIES
        ),
    )
    print(f"\nnext-stalest paired cohort (rotation candidates, top {cohort_size}):")
    for latest_round, name in stale[:cohort_size]:
        tag = f"r{latest_round}" if latest_round else "NEVER driver-checked"
        print(f"  {name}  (latest receipt: {tag})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
