"""Training-shard writer: determinism, coverage, order, manifest."""

import glob
import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.sinks.shards import (
    read_manifest,
    read_shard,
    write_training_shards,
)
from tests.conftest import SF_SMALL


def test_shards_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    n = 8
    manifest = write_training_shards(docs, path, num_shards=n, id_col="doc_id")

    # one data file per shard directory
    for i in range(n):
        files = glob.glob(os.path.join(path, f"shard={i}", "*.parquet"))
        assert len(files) == 1, (i, files)

    # full coverage, no duplication
    written = spark.read.parquet(path)
    assert written.count() == docs.count()
    assert written.select("doc_id").distinct().count() == docs.count()

    # manifest counts match the shard dirs
    m = {r.shard: r.n_rows for r in read_manifest(spark, path).collect()}
    assert sum(m.values()) == docs.count()
    assert set(m) == set(range(n))
    assert manifest.count() == n

    # no shard is pathologically unbalanced (uniform hash, 500 docs / 8)
    assert max(m.values()) < 3 * min(m.values()), m


def test_empty_corpus_yields_empty_manifest(spark, tmp_path):
    """Aggressive curation can legitimately filter everything; the shard
    writer must produce an empty manifest, not crash on schema
    inference over zero data files."""
    docs = spark.createDataFrame([], "doc_id long, text string")
    path = str(tmp_path / "sh")
    m = write_training_shards(docs, path, num_shards=4, id_col="doc_id")
    assert m.count() == 0
    assert read_manifest(spark, path).count() == 0


def test_shard_assignment_deterministic(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, p1, num_shards=4, id_col="doc_id")
    # second run from a differently-partitioned input
    write_training_shards(docs.repartition(13), p2, num_shards=4, id_col="doc_id")
    a = {(r.shard, r.doc_id) for r in spark.read.parquet(p1).select("shard", "doc_id").collect()}
    b = {(r.shard, r.doc_id) for r in spark.read.parquet(p2).select("shard", "doc_id").collect()}
    assert a == b


def test_within_shard_order_is_seeded_hash(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, num_shards=4, id_col="doc_id", seed=7)
    got = [r.doc_id for r in read_shard(spark, path, 2).coalesce(1).collect()]
    want = sorted(
        got,
        key=lambda i: __import__("hashlib").md5(f"{i}#order#7".encode()).hexdigest(),
    )
    assert got == want
    # the baked order is a shuffle, not the natural id order
    assert got != sorted(got)


def test_jsonl_export_matches_parquet_shards(spark, tmp_path):
    """The JSONL export is the parquet layout in another encoding: same
    shard membership, same within-shard order, same manifest
    fingerprints."""
    import glob
    import gzip
    import json

    from crypto_data_ingestion_module_spark.session import load_table
    from crypto_data_ingestion_module_spark.sinks.shards import (
        write_training_shards,
        write_training_shards_jsonl,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    pq_path = str(tmp_path / "pq")
    js_path = str(tmp_path / "js")
    m1 = write_training_shards(docs, pq_path, 4, "doc_id", seed=7)
    m2 = write_training_shards_jsonl(docs, js_path, 4, "doc_id", seed=7)
    a = {(r.shard, r.n_rows, r.fingerprint) for r in m1.collect()}
    b = {(r.shard, r.n_rows, r.fingerprint) for r in m2.collect()}
    assert a == b and len(a) == 4

    # per-shard row ORDER identical across encodings
    for shard in range(4):
        pq_rows = [
            r.doc_id
            for r in spark.read.parquet(f"{pq_path}/shard={shard}").collect()
        ]
        (jf,) = glob.glob(f"{js_path}/shard={shard}/*.json.gz")
        with gzip.open(jf, "rt") as fh:
            js_rows = [json.loads(line)["doc_id"] for line in fh]
        assert js_rows == pq_rows, shard
        assert len(js_rows) > 0
