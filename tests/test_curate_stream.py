"""Streaming curation (streaming/curate_stream.py): micro-batched
decontam → quality → incremental near-dup, finalized to shards, must
equal the one-shot batch ``curate_and_shard`` on the same documents."""

import glob
import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions import text as TX
from crypto_data_ingestion_module_spark.operators.decontam import decontaminate
from crypto_data_ingestion_module_spark.operators.text_dedup import (
    simhash_hamming_pairs,
)
from crypto_data_ingestion_module_spark.pipelines import curate_and_shard
from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.streaming.curate_stream import (
    finalize_curated,
    read_curate_docs,
    read_curate_pairs,
    stream_curate_ingest,
)
from tests.conftest import SF_SMALL


def _write_batch_file(df, target_dir):
    tmp = target_dir + ".tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(target_dir, exist_ok=True)
    src = glob.glob(os.path.join(tmp, "*.parquet"))[0]
    n = len(glob.glob(os.path.join(target_dir, "*.parquet")))
    os.rename(src, os.path.join(target_dir, f"batch-{n}.parquet"))


def test_stream_curation_equals_batch(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    caps = {"src0": 20, "src1": 20, "src2": 20}

    # ---- batch reference
    work_b = str(tmp_path / "batch")
    curate_and_shard(
        spark,
        train,
        bench,
        work_b,
        num_shards=8,
        quality_min=0.5,
        mixture_caps=caps,
    )
    batch_shards = spark.read.parquet(work_b + "/shards")

    # ---- streamed: HIGH ids first so later batches carry SMALLER ids
    # that overturn earlier exact/cluster representatives
    in_dir = str(tmp_path / "incoming")
    _write_batch_file(train.filter(F.col("doc_id") >= 300), in_dir)
    _write_batch_file(
        train.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300)),
        in_dir,
    )
    _write_batch_file(train.filter(F.col("doc_id") < 100), in_dir)

    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    source = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream_curate_ingest(source, bench, lake, ckpt, quality_min=0.5)
    q.awaitTermination(180)

    # three micro-batches landed, each in its own partition
    batches = {
        r.batch_id
        for r in read_curate_docs(spark, lake)
        .sparkSession.read.parquet(lake + "/docs")
        .select("batch_id")
        .distinct()
        .collect()
    }
    assert batches == {0, 1, 2}

    # the accumulated docs lake is exactly the decontaminated+gated set
    expect_docs = decontaminate(train, bench, n=4).filter(
        TX.quality_score("text") >= 0.5
    )
    assert {r.doc_id for r in read_curate_docs(spark, lake).collect()} == {
        r.doc_id for r in expect_docs.collect()
    }

    # incremental recall 1: the accumulated pair log equals the
    # from-scratch pair set over the union
    got_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in read_curate_pairs(spark, lake).collect()
    }
    want_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(expect_docs).collect()
    }
    assert got_pairs == want_pairs

    # finalize == batch pipeline, shard-for-shard
    shards_dir = str(tmp_path / "stream_shards")
    manifest = finalize_curated(
        spark, lake, shards_dir, num_shards=8, mixture_caps=caps
    )
    assert manifest.count() == 8
    stream_shards = spark.read.parquet(shards_dir)
    a = {
        (r.shard, r.doc_id)
        for r in batch_shards.select("shard", "doc_id").collect()
    }
    b = {
        (r.shard, r.doc_id)
        for r in stream_shards.select("shard", "doc_id").collect()
    }
    assert a == b and len(a) > 0
