"""Distributed sequence packing (r13, X4): hand-computed prefix-sum
pins and the partition-count-independence property that makes the scan
oracle-pairable."""

import pytest
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.packing import (
    pack_sequences,
    packed_positions,
)

ROWS = [
    # (doc_id, lang, n_tokens)
    (1, "en", 100), (2, "en", 950), (3, "en", 30),
    (4, "de", 1000), (5, "de", 1500),
    (6, "en", 2500),  # longer than the budget: starts its own window
    (7, "de", 1),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def _py_pack(rows, budget):
    out = {}
    acc = {}
    for doc_id, lang, n in sorted(rows):
        start = acc.get(lang, 0)
        out[doc_id] = (start, start // budget)
        acc[lang] = start + n
    return out


def test_packing_hand_computed(spark):
    got = {
        r["doc_id"]: (r["start_pos"], r["bin_id"])
        for r in pack_sequences(
            _df(spark), 1024, "n_tokens", ["doc_id"], ["lang"]
        ).collect()
    }
    assert got == _py_pack(ROWS, 1024)
    # spot values: en stream = 100, 950, 30, 2500 in doc order
    assert got[1] == (0, 0)
    assert got[2] == (100, 0)
    assert got[3] == (1050, 1)
    assert got[6] == (1080, 1)
    # de stream: 1000, 1500, 1
    assert got[5] == (1000, 0)
    assert got[7] == (2500, 2)


def test_packing_is_partition_count_independent(spark):
    base = {
        r["doc_id"]: r["start_pos"]
        for r in packed_positions(
            _df(spark), "n_tokens", ["doc_id"], ["lang"]
        ).collect()
    }
    for n in (1, 3, 17):
        alt = {
            r["doc_id"]: r["start_pos"]
            for r in packed_positions(
                _df(spark).repartition(n), "n_tokens", ["doc_id"], ["lang"]
            ).collect()
        }
        assert alt == base, n


def test_packing_without_strata(spark):
    rows = [(i, "x", 10) for i in range(1, 8)]
    got = {
        r["doc_id"]: r["start_pos"]
        for r in packed_positions(
            spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long"),
            "n_tokens",
            ["doc_id"],
        ).collect()
    }
    assert got == {i: (i - 1) * 10 for i in range(1, 8)}


def test_packing_null_stratum_is_its_own_group(spark):
    """NULL strata values form their own stream (the window treats NULL
    as one partition group) and must survive the carry-offset join —
    a plain equi-join would silently drop them (NULL != NULL)."""
    rows = [(1, None, 100), (2, "en", 50), (3, None, 60), (4, "en", 7)]
    got = {
        r["doc_id"]: (r["lang"], r["start_pos"])
        for r in packed_positions(
            spark.createDataFrame(
                rows, "doc_id long, lang string, n_tokens long"
            ),
            "n_tokens",
            ["doc_id"],
            ["lang"],
        ).collect()
    }
    assert got == {
        1: (None, 0),
        3: (None, 100),
        2: ("en", 0),
        4: ("en", 50),
    }


def test_packing_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_df(spark), 0, "n_tokens", ["doc_id"], ["lang"])


def test_registered_row_uses_distributed_scan(spark):
    """The registered pack_sequences row must carry the r13 upgrade:
    no whole-stratum window (the plan has the carry-offset broadcast
    join instead)."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["pack_sequences"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the carry-offset join


def test_packing_plan_stays_jvm_side(spark):
    df = pack_sequences(_df(spark), 64, "n_tokens", ["doc_id"], ["lang"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the carry-offset join
