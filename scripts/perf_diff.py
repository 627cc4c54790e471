#!/usr/bin/env python3
"""Cross-round perf regression gate (VERDICT r5 item 6).

Usage:
    python3 scripts/perf_diff.py NEW.json OLD.json [threshold]

Each argument is either a PERF_r{N}.json artifact written by bench.py
(``SPARK_GRAFT_PERF_OUT=PERF_r6.json python3 bench.py``) or a driver
BENCH_r{N}.json (falls back to its parsed settled-headline block — the
only per-query detail the driver's truncated tail preserves for rounds
that predate the artifact).

Compares the per-query settled-sweep times on the queries common to both
rounds and flags every query slower than ``threshold``x (default 1.5) its
prior time, with the re-measure recipe PERF.md's receipt discipline
requires.  Exit status: 0 clean, 2 when any query is flagged — so a
round close-out can gate on it.

In-sweep numbers carry documented 3-10x GC variance on single queries;
a flag here is a TRIGGER for a standalone-warm noop-sink re-measure
(see PERF.md round 6 methodology note), not a verdict by itself.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict[str, dict[str, float]]:
    """Return {'sweep': ..., 'headline': ...} (either may be missing).

    Settled-headline numbers and in-sweep numbers are NOT comparable
    (in-sweep carries cross-query GC/codegen interference); the diff
    below pairs sweep-to-sweep and headline-to-headline only."""
    with open(path) as fh:
        d = json.load(fh)
    out: dict[str, dict[str, float]] = {}
    if "sweep" in d:  # PERF_r{N}.json artifact
        out["sweep"] = dict(d["sweep"])
        out["headline"] = dict(d.get("headline", {}))
        return out
    if "queries" in d:  # a raw bench.py output line saved to a file
        key = "headline" if "headline" in d.get("metric", "") else "sweep"
        out[key] = dict(d["queries"])
        return out
    parsed = d.get("parsed") or {}
    if "queries" in parsed:  # driver BENCH_r{N}.json (settled headline)
        out["headline"] = dict(parsed["queries"])
        return out
    raise SystemExit(f"{path}: no per-query timings found")


def diff_section(
    kind: str,
    new: dict[str, float],
    old: dict[str, float],
    threshold: float,
) -> list[tuple[str, float, float, float]]:
    """Print the round-over-round comparison for one section and return
    the flagged queries.  Sections are never cross-compared (in-sweep
    numbers carry interference the settled headline does not)."""
    print(f"comparing {kind} timings")
    common = sorted(set(new) & set(old))
    if not common:
        print(f"  no common {kind} queries between the two rounds")
        return []

    t_new = sum(new[q] for q in common)
    t_old = sum(old[q] for q in common)
    print(
        f"{len(common)} common queries: {t_new:.2f} s vs {t_old:.2f} s "
        f"({t_new / t_old:.2f}x round-over-round)"
    )
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new this round ({len(only_new)}): {', '.join(only_new)}")
    only_old = sorted(set(old) - set(new))
    if only_old:
        print(f"retired ({len(only_old)}): {', '.join(only_old)}")

    flagged = [
        (q, old[q], new[q], new[q] / old[q])
        for q in common
        if old[q] > 0 and new[q] / old[q] > threshold
    ]
    if not flagged:
        print(f"no {kind} query above {threshold}x its prior time — clean")
        return []
    print(f"\nFLAGGED {kind} (> {threshold}x prior; re-measure standalone before attributing):")
    for q, t_o, t_n, r in sorted(flagged, key=lambda t: -t[3]):
        print(f"  {q}: {t_o:.3f} s -> {t_n:.3f} s ({r:.2f}x)")
    return flagged


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    new_path, old_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a, b = _load(new_path), _load(old_path)
    # Diff EVERY section present in both artifacts and flag on either —
    # diffing only the first common section let a 1.23x settled-headline
    # drift pass ungated while the sweep stayed under threshold (r7).
    kinds = [k for k in ("sweep", "headline") if a.get(k) and b.get(k)]
    if not kinds:
        raise SystemExit(
            "no comparable section: one file has only sweep, the other "
            "only headline"
        )
    any_flagged = False
    for kind in kinds:
        if any_flagged:
            print()
        any_flagged = bool(diff_section(kind, a[kind], b[kind], threshold)) or any_flagged
    if not any_flagged:
        return 0
    print(
        "\nreceipt recipe: 2 warm-ups + System.gc + 5 noop-sink runs at "
        "sf0.1 local[32] (PERF.md round-6 methodology note), then record "
        "the attribution in PERF.md"
    )
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
