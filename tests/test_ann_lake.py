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
