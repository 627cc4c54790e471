"""IVF-at-rest (sinks/ann_lake.py): the probe join over the bucketed
inverted lists must read only the probed buckets with zero shuffle, and
return exactly what the per-run relational IVF returns."""

import uuid

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.similarity import (
    ann_ivf_seed_topk,
)
from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.sinks.ann_lake import (
    ann_ivf_probe_bucketed,
    assert_pruned_no_shuffle_probe,
    write_ivf_index,
)
from tests.conftest import SF_SMALL


def _bits(x: float) -> int:
    import struct

    return struct.unpack("<q", struct.pack("<d", x))[0]


def test_bucketed_ivf_probe_pruned_no_shuffle_and_exact(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    table = f"ivf_test_{uuid.uuid4().hex[:8]}"
    n_lists, nprobe, k = 16, 4, 10

    write_ivf_index(
        emb, table, n_lists=n_lists, path=str(tmp_path / "ivf")
    )
    try:
        topk, cand = ann_ivf_probe_bucketed(
            spark, table, queries, k=k, n_lists=n_lists, nprobe=nprobe
        )
        # serving contract: bucket-pruned scan, no corpus shuffle.  Each
        # query probes nprobe lists; distinct probed lists across the
        # query set is at most n_lists (and must be what the scan reads).
        assert_pruned_no_shuffle_probe(cand, nprobe_lists=n_lists)

        # bit parity with the per-run relational IVF (same quantizer,
        # same fixed-point dots, same tie-breaks)
        want = {
            (r.qid, r.nid, r.rank): _bits(r.cosine)
            for r in ann_ivf_seed_topk(
                emb,
                queries,
                k=k,
                n_lists=n_lists,
                nprobe=nprobe,
                vectorized=False,
            ).collect()
        }
        got = {
            (r.qid, r.nid, r.rank): _bits(r.cosine) for r in topk.collect()
        }
        assert got == want and len(got) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_ivf_probe_empty_queries(spark, tmp_path):
    emb = load_table(spark, SF_SMALL, "embeddings")
    table = f"ivf_test_{uuid.uuid4().hex[:8]}"
    write_ivf_index(emb, table, n_lists=8, path=str(tmp_path / "ivf"))
    try:
        topk, cand = ann_ivf_probe_bucketed(
            spark, table, emb.filter(F.lit(False)), k=5, n_lists=8, nprobe=2
        )
        assert topk.count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_ivfpq_probe_pruned_no_shuffle_and_exact(spark, tmp_path):
    """IVF-PQ at rest: the stored-index probe must return exactly what
    the inline ann_ivfpq_topk composition returns (bit-identical ADC),
    with a candidate plan that reads only probed buckets, shuffles
    nothing, and contains no aggregation — per-row LUT folds only."""
    import uuid as _uuid

    from crypto_data_ingestion_module_spark.operators.pq import (
        ann_ivfpq_topk,
    )
    from crypto_data_ingestion_module_spark.sinks.ann_lake import (
        ann_ivfpq_probe_bucketed,
        write_ivfpq_index,
    )
    from crypto_data_ingestion_module_spark.sinks.bucketed import (
        physical_plan,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    table = f"ivfpq_test_{_uuid.uuid4().hex[:8]}"
    n_lists, nprobe, k, m, kc = 16, 4, 10, 8, 16

    write_ivfpq_index(
        emb,
        table,
        n_lists=n_lists,
        m=m,
        k_codes=kc,
        path=str(tmp_path / "ivfpq"),
    )
    try:
        topk, cand = ann_ivfpq_probe_bucketed(
            spark, table, queries, k=k, n_lists=n_lists, nprobe=nprobe, m=m
        )
        # serving contract: bucket-pruned, no corpus shuffle (the one
        # BroadcastExchange ships the tiny probe/LUT relation), and —
        # unlike the cosine path — no aggregation at all: ADC is a
        # per-row fold over the byte codes
        assert_pruned_no_shuffle_probe(cand, nprobe * queries.count())
        plan = physical_plan(cand)
        assert "HashAggregate" not in plan, plan

        want = ann_ivfpq_topk(
            emb,
            queries,
            n_lists=n_lists,
            nprobe=nprobe,
            m=m,
            k_codes=kc,
            topk=k,
        )
        a = sorted(
            (r.qid, r.nid, r.rank, _bits(r.adc_d2)) for r in topk.collect()
        )
        b = sorted(
            (r.qid, r.nid, r.rank, _bits(r.adc_d2)) for r in want.collect()
        )
        assert a == b
        assert len(a) > 0
    finally:
        for t in (table, f"{table}_cent", f"{table}_cb"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_lsh_probe_pruned_no_shuffle_and_exact(spark, tmp_path):
    """LSH-at-rest (r16): the probe reads only the colliding buckets
    (SelectedBucketsCount), never shuffles the corpus, and returns
    bit-identically what the per-run ann_lsh_seed_topk returns."""
    from crypto_data_ingestion_module_spark.operators.similarity import (
        ann_lsh_seed_topk,
    )
    from crypto_data_ingestion_module_spark.sinks.ann_lake import (
        ann_lsh_probe_bucketed,
        write_lsh_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    # a SMALL query set (the serving shape) so pruning is observable:
    # 3 queries x 16 tables <= 48 of 64 physical buckets
    queries = emb.filter(F.col("vec_id") % 200 == 0)
    table = f"lsh_test_{uuid.uuid4().hex[:8]}"
    n_planes, n_tables, k = 4, 16, 10

    write_lsh_index(
        emb,
        table,
        n_planes=n_planes,
        n_tables=n_tables,
        num_buckets=64,
        path=str(tmp_path / "lsh"),
    )
    try:
        topk, cand = ann_lsh_probe_bucketed(
            spark, table, queries, k=k, n_planes=n_planes, n_tables=n_tables
        )
        n_queries = queries.count()
        assert_pruned_no_shuffle_probe(
            cand, nprobe_lists=n_queries * n_tables
        )

        want = {
            (r.qid, r.nid, r.rank): _bits(r.cosine)
            for r in ann_lsh_seed_topk(
                emb, queries, k=k, n_planes=n_planes, n_tables=n_tables
            ).collect()
        }
        got = {
            (r.qid, r.nid, r.rank): _bits(r.cosine) for r in topk.collect()
        }
        assert got == want
        assert len(got) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
