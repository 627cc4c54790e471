"""Tests for the repo's round close-out scripts (no SparkSession).

perf_diff must compare EVERY section present in both artifacts: r7's
1.23x settled-headline drift passed ungated because the diff stopped at
the first common section (sweep) when both files carried sweep AND
headline blocks (ADVICE r7, scripts/perf_diff.py:62).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PERF_DIFF = os.path.join(REPO, "scripts", "perf_diff.py")


def _run(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, PERF_DIFF, *argv],
        capture_output=True,
        text=True,
    )


def _write(tmp_path, name: str, payload: dict) -> str:
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def test_headline_only_regression_is_flagged(tmp_path):
    """Both files have sweep AND headline; sweep is clean, headline
    regresses 2x — the diff must flag it (exit 2) and say which."""
    old = _write(
        tmp_path,
        "old.json",
        {
            "sweep": {"q1": 1.0, "q2": 2.0},
            "headline": {"q1": 1.0, "q2": 2.0},
        },
    )
    new = _write(
        tmp_path,
        "new.json",
        {
            "sweep": {"q1": 1.0, "q2": 2.0},
            "headline": {"q1": 2.0, "q2": 2.0},
        },
    )
    res = _run(new, old)
    assert res.returncode == 2, res.stdout + res.stderr
    assert "FLAGGED headline" in res.stdout
    assert "comparing sweep timings" in res.stdout
    assert "comparing headline timings" in res.stdout


def test_sweep_only_regression_still_flagged(tmp_path):
    old = _write(
        tmp_path,
        "old.json",
        {"sweep": {"q1": 1.0}, "headline": {"q1": 1.0}},
    )
    new = _write(
        tmp_path,
        "new.json",
        {"sweep": {"q1": 9.0}, "headline": {"q1": 1.0}},
    )
    res = _run(new, old)
    assert res.returncode == 2, res.stdout + res.stderr
    assert "FLAGGED sweep" in res.stdout


def test_clean_both_sections_exit_zero(tmp_path):
    old = _write(
        tmp_path,
        "old.json",
        {"sweep": {"q1": 1.0}, "headline": {"q1": 1.0}},
    )
    new = _write(
        tmp_path,
        "new.json",
        {"sweep": {"q1": 1.1}, "headline": {"q1": 0.9}},
    )
    res = _run(new, old)
    assert res.returncode == 0, res.stdout + res.stderr


def test_driver_bench_artifact_headline_fallback(tmp_path):
    """A driver BENCH_r{N}.json (parsed headline only) still pairs with
    a full PERF artifact on the headline section."""
    old = _write(
        tmp_path,
        "old.json",
        {"parsed": {"queries": {"q1": 1.0, "q2": 1.0}}},
    )
    new = _write(
        tmp_path,
        "new.json",
        {"sweep": {"q1": 5.0}, "headline": {"q1": 1.0, "q2": 3.0}},
    )
    res = _run(new, old)
    assert res.returncode == 2, res.stdout + res.stderr
    assert "q2" in res.stdout
    # sweep has no counterpart in the driver artifact: must not crash,
    # must still diff the headline
    assert "comparing headline timings" in res.stdout
