"""End-to-end curation pipeline: every surviving shard row must satisfy
every stage's invariant, and the whole run must be deterministic."""

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions import text as TX
from crypto_data_ingestion_module_spark.operators.decontam import (
    contamination_flags,
)
from crypto_data_ingestion_module_spark.pipelines import curate_and_shard
from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.sinks.shards import read_manifest
from tests.conftest import SF_SMALL


def test_curate_and_shard_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    work = str(tmp_path / "work")

    manifest = curate_and_shard(
        spark, train, bench, work, num_shards=8, quality_min=0.5
    )
    assert manifest.count() == 8

    shards = spark.read.parquet(work + "/shards")
    out_rows = shards.count()
    assert out_rows == sum(r.n_rows for r in read_manifest(spark, work + "/shards").collect())
    assert 0 < out_rows < train.count()

    out = shards.select("doc_id", "text").join(
        docs.select("doc_id", F.col("text").alias("orig")), "doc_id"
    )
    # payload integrity through every stage
    assert out.filter(F.col("text") != F.col("orig")).count() == 0

    # stage invariants on the survivors
    surv = shards
    # 1. no contaminated doc survived
    flags = contamination_flags(train, bench, n=4)
    bad = surv.join(flags.filter("contaminated").select("doc_id"), "doc_id", "semi")
    assert bad.count() == 0
    # 2. quality gate held
    assert surv.filter(TX.quality_score("text") < 0.5).count() == 0
    # 3. exact dedup: no two surviving rows share text
    assert surv.groupBy("text").count().filter("count > 1").count() == 0
    # 4. cluster reps only: cluster table marks every survivor is_rep
    clusters = spark.read.parquet(work + "/clusters")
    not_rep = surv.join(
        clusters.filter(~F.col("is_rep")).select("doc_id"), "doc_id", "semi"
    )
    assert not_rep.count() == 0

    # deterministic end-to-end: a second run shards identically
    work2 = str(tmp_path / "work2")
    curate_and_shard(spark, train, bench, work2, num_shards=8, quality_min=0.5)
    a = {(r.shard, r.doc_id) for r in shards.select("shard", "doc_id").collect()}
    b = {
        (r.shard, r.doc_id)
        for r in spark.read.parquet(work2 + "/shards").select("shard", "doc_id").collect()
    }
    assert a == b


def test_curate_with_mixture_caps(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    work = str(tmp_path / "work")
    caps = {"src0": 5, "src1": 5}
    curate_and_shard(
        spark, docs, None, work, num_shards=4, mixture_caps=caps
    )
    out = spark.read.parquet(work + "/shards")
    counts = {
        r.source: r.c
        for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts) <= set(caps)
    assert all(counts[s] <= caps[s] for s in counts)
