"""Incremental join-view maintenance (operators/ivm.py).

Every property the delta rule + view-first commit protocol promises:
incremental ≡ recompute after arbitrary batch interleavings, bag
(multiplicity) semantics, replay immunity, and crash-replay around the
three-lake commit sequence.
"""

import pytest
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.ivm import (
    _append,
    maintain_join_view,
    read_join_view,
    recompute_join,
)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _check(spark, root):
    got = _sorted_rows(read_join_view(spark, root))
    want = _sorted_rows(recompute_join(spark, root, "k"))
    assert got == want
    return got


def _left(spark, rows):
    return spark.createDataFrame(rows, "k long, lval string")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k long, rval string")


def test_incremental_equals_recompute_over_interleaved_batches(spark, tmp_path):
    root = str(tmp_path / "ivm")
    maintain_join_view(
        spark, root, _left(spark, [(1, "a"), (2, "b")]),
        _right(spark, [(1, "x")]), "k", 1,
    )
    _check(spark, root)
    # right-only batch joins against accumulated left
    maintain_join_view(
        spark, root, None, _right(spark, [(2, "y"), (3, "z")]), "k", 2
    )
    _check(spark, root)
    # left-only batch joins against accumulated right
    maintain_join_view(spark, root, _left(spark, [(3, "c")]), None, "k", 3)
    _check(spark, root)
    # both sides at once: all three delta terms fire
    maintain_join_view(
        spark, root, _left(spark, [(4, "d"), (1, "a2")]),
        _right(spark, [(4, "w"), (1, "x2")]), "k", 4,
    )
    rows = _check(spark, root)
    # key 1 now has 2 left x 2 right = 4 view rows (bag semantics)
    assert sum(1 for r in rows if 1 in r) == 4


def test_duplicate_rows_keep_multiplicity(spark, tmp_path):
    root = str(tmp_path / "dup")
    maintain_join_view(
        spark, root, _left(spark, [(7, "p"), (7, "p")]),
        _right(spark, [(7, "q")]), "k", 1,
    )
    assert len(_check(spark, root)) == 2


def test_replayed_batch_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "replay")
    l1, r1 = _left(spark, [(1, "a")]), _right(spark, [(1, "x")])
    maintain_join_view(spark, root, l1, r1, "k", 1)
    before = _check(spark, root)
    maintain_join_view(spark, root, l1, r1, "k", 1)  # redelivery
    assert _check(spark, root) == before


def test_crash_after_view_commit_replay_converges(spark, tmp_path):
    # Simulate: batch 2's VIEW delta committed, then crash before either
    # side commit; the replay recomputes a ΔJ that would now be wrong if
    # applied, but the view ledger discards it and the sides catch up.
    root = str(tmp_path / "crash")
    maintain_join_view(
        spark, root, _left(spark, [(1, "a")]), _right(spark, [(1, "x")]),
        "k", 1,
    )
    lb, rb = _left(spark, [(1, "a2")]), _right(spark, [(1, "x2")])
    # the real ΔJ for this batch, computed exactly like maintain does:
    from crypto_data_ingestion_module_spark.operators import ivm

    a0 = ivm._read_side(spark, f"{root}/left")
    b0 = ivm._read_side(spark, f"{root}/right")
    dj = lb.join(b0, "k").unionByName(a0.join(rb, "k")).unionByName(
        lb.join(rb, "k")
    )
    _append(spark, f"{root}/view", dj, "k", "ivm-view-2")  # "crash" here
    maintain_join_view(spark, root, lb, rb, "k", 2)  # replay
    _check(spark, root)


def test_crash_after_one_side_commit_replay_converges(spark, tmp_path):
    # Worse crash point: view AND left committed, right missed; the
    # replayed ΔJ (computed against a left that already contains the
    # batch) MUST be discarded by the view ledger or key-1 rows double.
    root = str(tmp_path / "crash2")
    maintain_join_view(
        spark, root, _left(spark, [(1, "a")]), _right(spark, [(1, "x")]),
        "k", 1,
    )
    from crypto_data_ingestion_module_spark.operators import ivm

    lb, rb = _left(spark, [(1, "a2")]), _right(spark, [(1, "x2")])
    a0 = ivm._read_side(spark, f"{root}/left")
    b0 = ivm._read_side(spark, f"{root}/right")
    dj = lb.join(b0, "k").unionByName(a0.join(rb, "k")).unionByName(
        lb.join(rb, "k")
    )
    _append(spark, f"{root}/view", dj, "k", "ivm-view-2")
    _append(spark, f"{root}/left", lb, "k", "ivm-left-2")  # crash here
    maintain_join_view(spark, root, lb, rb, "k", 2)  # replay
    _check(spark, root)


def test_keys_without_partner_produce_no_view_rows_until_matched(spark, tmp_path):
    root = str(tmp_path / "late")
    maintain_join_view(spark, root, _left(spark, [(9, "lonely")]), None, "k", 1)
    # no right side at all yet -> no view lake commit is even possible
    with pytest.raises(FileNotFoundError):
        read_join_view(spark, root)
    maintain_join_view(spark, root, None, _right(spark, [(9, "match")]), "k", 2)
    assert len(_check(spark, root)) == 1
