"""Streaming incremental dedup: micro-batched ingestion must find the
same pairs as a from-scratch batch run, keep the fingerprint lake
complete, and recover idempotently from a checkpoint restart."""

import glob
import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.text_dedup import (
    minhash_lsh_pairs,
)
from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.streaming.dedup_stream import (
    read_fingerprint_index,
    read_pair_log,
    stream_dedup_ingest,
)
from tests.conftest import SF_SMALL


def _write_batch_file(df, target_dir):
    """One parquet FILE per call → one micro-batch under
    maxFilesPerTrigger=1."""
    tmp = target_dir + ".tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(target_dir, exist_ok=True)
    src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
    n = len(glob.glob(os.path.join(target_dir, "*.parquet")))
    os.rename(src, os.path.join(target_dir, f"batch-{n}.parquet"))


def test_stream_dedup_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    in_dir = str(tmp_path / "incoming")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    _write_batch_file(docs.filter(F.col("doc_id") < 200), in_dir)
    _write_batch_file(docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)), in_dir)

    source = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_dedup_ingest(source, lake, ckpt)
    q.awaitTermination(120)

    # two micro-batches ran, partitioned pair log
    batches = {r.batch_id for r in read_pair_log(spark, lake).select("batch_id").distinct().collect()}
    assert batches == {0, 1}

    # late third batch after a RESTART from the same checkpoint
    _write_batch_file(docs.filter(F.col("doc_id") >= 400), in_dir)
    source2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q2 = stream_dedup_ingest(source2, lake, ckpt)
    q2.awaitTermination(120)

    idx = read_fingerprint_index(spark, lake)
    assert idx.select("id").distinct().count() == docs.count()

    streamed = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in read_pair_log(spark, lake).collect()
    }
    batch = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert streamed == batch
