"""Streaming md5-MinHash pair log (r15, streaming/dedup_stream.py
stream_dedup_ingest_md5): the accumulated pair log must equal the
one-shot minhash_lsh_pairs_md5 pair set for any batch split — pure
per-document band keys emit every unordered pair exactly once, in the
batch that carries its later side."""

import glob
import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.text_dedup import (
    incremental_minhash_md5_pairs,
    minhash_lsh_pairs_md5,
)
from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.streaming.dedup_stream import (
    read_dedup_pairs_md5,
    stream_dedup_ingest_md5,
)
from tests.conftest import SF_SMALL


def _pairs(df):
    return sorted(
        (r.id_a, r.id_b, r.n_match, r.est_jaccard)
        for r in df.select("id_a", "id_b", "n_match", "est_jaccard").collect()
    )


def test_streamed_pair_log_equals_one_shot(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for n, i in enumerate([2, 0, 1]):  # shuffled arrival
        tmp = str(tmp_path / f"t{i}")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(tmp)
        os.rename(
            glob.glob(tmp + "/*.parquet")[0],
            os.path.join(in_dir, f"b{n}.parquet"),
        )
    src = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    lake = str(tmp_path / "lake")
    q = stream_dedup_ingest_md5(src, lake, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = _pairs(read_dedup_pairs_md5(spark, lake))
    want = _pairs(minhash_lsh_pairs_md5(docs))
    assert got == want and want  # non-trivial pair set


def test_incremental_pairs_batch_split_independent(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    one_shot = _pairs(minhash_lsh_pairs_md5(docs))

    index = None
    acc = []
    for i in range(2):
        batch = docs.filter(F.col("doc_id") % 2 == i)
        pairs, bands = incremental_minhash_md5_pairs(batch, index)
        acc.extend(_pairs(pairs))
        index = bands if index is None else index.unionByName(bands)
    assert sorted(acc) == one_shot
