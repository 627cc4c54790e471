"""Bit-parity of the Arrow-batched fixed-point kernels vs the interpreted
Column-lambda paths.

The vectorized kernels (`similarity._fpdot_arrow_udf`,
`quantize._qdot_arrow_udf`) claim BIT-IDENTICAL results to the
higher-order-function formulations — every rounded product is an exact
integer in float64/int64, so accumulation order cannot matter, and
rounding is explicit half-away-from-zero.  These tests pin that claim:
same rows, same float bits, for every operator that switched kernels.
"""

import struct

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.quantize import (
    quantize_embeddings,
    quantized_cosine_topk,
)
from crypto_data_ingestion_module_spark.operators.similarity import (
    ann_ivf_seed_topk,
    cosine_topk,
)
from crypto_data_ingestion_module_spark.session import load_table
from tests.conftest import SF_SMALL


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def _keyed(rows, val_col):
    return {(r.qid, r.nid, r.rank): _bits(r[val_col]) for r in rows}


def test_cosine_topk_vectorized_bit_parity(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    slow = cosine_topk(
        emb, queries, k=10, exact=True, long_safe=True, vectorized=False
    ).collect()
    fast = cosine_topk(
        emb, queries, k=10, exact=True, long_safe=True, vectorized=True
    ).collect()
    assert _keyed(slow, "cosine") == _keyed(fast, "cosine")
    # and against the DECIMAL-accumulated default, same bits again
    dec = cosine_topk(
        emb, queries, k=10, exact=True, long_safe=False, vectorized=False
    ).collect()
    assert _keyed(dec, "cosine") == _keyed(fast, "cosine")


def test_ann_ivf_seed_vectorized_bit_parity(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    slow = ann_ivf_seed_topk(
        emb, queries, k=10, n_lists=8, nprobe=3, vectorized=False
    ).collect()
    fast = ann_ivf_seed_topk(
        emb, queries, k=10, n_lists=8, nprobe=3, vectorized=True
    ).collect()
    assert _keyed(slow, "cosine") == _keyed(fast, "cosine")


def test_quantized_topk_vectorized_bit_parity(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    qemb = quantize_embeddings(emb)
    qq = qemb.filter(F.col("vec_id") % 200 == 0)
    slow = quantized_cosine_topk(qemb, qq, k=10, vectorized=False).collect()
    fast = quantized_cosine_topk(qemb, qq, k=10, vectorized=True).collect()
    assert _keyed(slow, "qcosine") == _keyed(fast, "qcosine")


def test_simhash60_kernel_bit_parity(spark):
    """Arrow md5-SimHash kernel vs the Column/SQL formulation: identical
    fingerprints (including null/empty-text row absence) and identical
    Hamming pair sets through both paths of simhash_hamming_pairs."""
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        simhash60_md5,
        simhash60_md5_kernel,
        simhash_hamming_pairs,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    # adversarial rows: null text, empty text, whitespace-only, >cap dup
    extra = spark.createDataFrame(
        [
            (900001, None),
            (900002, ""),
            (900003, "   \t\n "),
            (900004, "tok " * 70000),
            (900005, "Mixed CASE tokens 42 mixed case TOKENS 42"),
        ],
        "doc_id long, text string",
    )
    df = docs.select("doc_id", "text").unionByName(extra)
    col_fp = {(r.id, r.simhash60) for r in simhash60_md5(df).collect()}
    ker_fp = {(r.id, r.simhash60) for r in simhash60_md5_kernel(df).collect()}
    assert col_fp == ker_fp
    # null/empty/whitespace docs are absent from BOTH
    present = {i for i, _ in ker_fp}
    assert {900001, 900002, 900003}.isdisjoint(present)
    assert {900004, 900005} <= present

    slow = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(df, vectorized=False).collect()
    }
    fast = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(df, vectorized=True).collect()
    }
    assert slow == fast


def test_semantic_near_dup_vectorized_bit_parity(spark):
    """Per-list matmul kernel (assignment argmax + pair matrix) vs the
    relational twin: identical pair sets, bit-identical cosines."""
    from crypto_data_ingestion_module_spark.operators.similarity import (
        semantic_near_dup_pairs,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    slow = {
        (r.list_id, r.id_a, r.id_b): _bits(r.cosine)
        for r in semantic_near_dup_pairs(emb, vectorized=False).collect()
    }
    fast = {
        (r.list_id, r.id_a, r.id_b): _bits(r.cosine)
        for r in semantic_near_dup_pairs(emb, vectorized=True).collect()
    }
    assert slow == fast and len(fast) > 0
