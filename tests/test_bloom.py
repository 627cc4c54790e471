"""Broadcast Bloom-filter pruning (operators/bloom.py).

The oracle pairing for ``decontaminate_docs_bloom`` already pins
answer-equality against plain SQL (tests/test_queries_oracle.py); these
tests pin the filter mechanics the oracle can't see: the no-false-
negative guarantee, the false-positive bound, NULL semantics, and
bit-for-bit equality between the Bloom-prefiltered and exact operators.
"""

import pytest
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.bloom import (
    bloom_bitset,
    with_bloom_flag,
)
from crypto_data_ingestion_module_spark.operators.decontam import (
    contamination_flags,
    contamination_flags_bloom,
)
from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _hits(df, bits):
    return with_bloom_flag(df, "k", bits, flag="hit")


def test_no_false_negatives(spark):
    # Every key that went into the bitset must test positive.
    keys = _docs(spark).select(F.col("text").alias("k"))
    bits = bloom_bitset(keys, "k")
    n = keys.count()
    n_pass = _hits(keys, bits).where("hit").count()
    assert n_pass == n


def test_false_positive_rate_bounded(spark):
    # Build over ~500 doc texts (m=2^17, k=5 -> theoretical FPR ~1e-9);
    # probe 5000 disjoint keys and allow a generous 1% margin.
    docs = _docs(spark)
    bits = bloom_bitset(docs.select(F.col("text").alias("k")), "k")
    probe = spark.range(5000).select(
        F.concat(F.lit("absent-"), F.col("id").cast("string")).alias("k")
    )
    fp = _hits(probe, bits).where("hit").count()
    assert fp <= 50  # 1% of 5000


def test_null_semantics_match_equi_join(spark):
    # NULL never matches in an equi-join; the bloom test must agree on
    # both sides: NULL build keys set no bits, NULL probes test False.
    build = spark.createDataFrame([("a",), (None,)], "k string")
    bits = bloom_bitset(build, "k")
    probe = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    got = {r["k"]: r["hit"] for r in _hits(probe, bits).collect()}
    assert got["a"] is True
    assert got[None] is False
    # "b" may be a false positive in principle; with 1 key in 2^17 bits
    # it must not be.
    assert got["b"] is False


def test_bloom_flags_equal_exact_flags(spark):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    exact = contamination_flags(train, bench, n=4).orderBy("doc_id").collect()
    fast = (
        contamination_flags_bloom(train, bench, n=4).orderBy("doc_id").collect()
    )
    assert exact == fast


def test_tiny_bitset_still_exact(spark):
    # Degenerate m (high FPR): candidates flood the confirm join, but
    # the exact verify keeps the ANSWER identical — the property that
    # makes the prefilter safe to deploy at any m.
    d = _docs(spark).limit(100)
    bench = d.filter(F.col("doc_id") % 7 == 0)
    train = d.filter(F.col("doc_id") % 7 != 0)
    exact = contamination_flags(train, bench, n=4).orderBy("doc_id").collect()
    fast = (
        contamination_flags_bloom(train, bench, n=4, num_bits=64)
        .orderBy("doc_id")
        .collect()
    )
    assert exact == fast


def test_no_python_in_plan(spark):
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    plan = (
        contamination_flags_bloom(train, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_shuffle_confirm_regime_still_exact(spark):
    # broadcast_benchmark=False splits the plan (totals agg + candidate-
    # only shuffle join); the answer must stay row-for-row the exact
    # operator's in the same regime, including zero-hit docs.
    d = _docs(spark)
    bench = d.filter(F.col("doc_id") % 7 == 0)
    train = d.filter(F.col("doc_id") % 7 != 0)
    exact = (
        contamination_flags(train, bench, n=4, broadcast_benchmark=False)
        .orderBy("doc_id")
        .collect()
    )
    fast = (
        contamination_flags_bloom(
            train, bench, n=4, broadcast_benchmark=False, num_bits=1 << 20
        )
        .orderBy("doc_id")
        .collect()
    )
    assert exact == fast
