#!/usr/bin/env python3
"""Direct >=10x scale receipt: time the most expensive registry queries
at sf0.1 and at the seeded ~sf1 dataset (scripts/gen_scale_data.py) and
report the wall-clock ratio for 10x the rows.  Sub-linear ratios are
the evidence that the plans' shuffle/partition strategy survives a
scale-up (a super-linear query is a bug to explain, not variance).

Protocol per (query, scale): warm once at both scales (codegen +
parquet footers), JVM settle (System.gc + 1s), then N measured runs;
the MEDIAN is the quoted number (VERDICT r8: best-of-2 was adequate
for a sanity probe, medians are the quotable extrapolation basis).

Usage:
    python3 scripts/gen_scale_data.py            # once, builds sf1 dir
    python3 scripts/scale_probe.py [--runs N] [--out FILE] [query ...]

Defaults: runs=3, out=/tmp/scale_probe.json, queries=the top-10
most-expensive sweep queries from round 8.  Committed artifacts:
PERF_scale_r8.json (best-of-2, r8), PERF_scale_r9.json (3-run median).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "dedup_clusters",
    "volume_shipping_by_year",
    "pricing_summary",
    "excess_share_suppliers",
    "hashed_doc_similarity",
    "order_revenue_by_priority",
    "minhash_lsh_pairs",
    "bpe_vocab",
    "ann_ivfpq_topk",
    "simhash_fingerprints",
]
SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = "/tmp/spark_graft_sf1"


def main() -> int:
    argv = sys.argv[1:]
    runs, out_path, queries = 3, "/tmp/scale_probe.json", []
    skip = -1
    for i, tok in enumerate(argv):
        if i == skip:
            continue
        if tok == "--runs":
            runs, skip = int(argv[i + 1]), i + 1
        elif tok == "--out":
            out_path, skip = argv[i + 1], i + 1
        else:
            queries.append(tok)
    queries = queries or DEFAULT_QUERIES

    if not os.path.isdir(SF_BIG):
        print(f"{SF_BIG} missing — run scripts/gen_scale_data.py first")
        return 1

    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS
    from crypto_data_ingestion_module_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(name: str, d: str) -> float:
        t0 = time.perf_counter()
        QUERY_SPECS[name].spark(spark, d).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 3)

    out = {}
    for name in queries:
        run_once(name, SF_SMALL)
        run_once(name, SF_BIG)
        spark._jvm.System.gc()
        time.sleep(1.0)
        small = [run_once(name, SF_SMALL) for _ in range(runs)]
        big = [run_once(name, SF_BIG) for _ in range(runs)]
        t_small = statistics.median(small)
        t_big = statistics.median(big)
        out[name] = {
            "sf0.1_sec": t_small,
            "sf1_sec": t_big,
            "ratio": round(t_big / t_small, 2),
            "sf0.1_runs": small,
            "sf1_runs": big,
        }
        print(name, json.dumps(out[name]), flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"DONE -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
