"""Streaming incremental dedup: documents arrive as a stream, each
micro-batch is near-dup-checked against the fingerprint lake and its
fingerprints are appended — the streaming face of
``operators.incremental`` (which in turn is the dedup-axis analogue of
the reference's watermark-incremental candle collection,
crypto_collector.py:481-520).

Per micro-batch cost is O(batch + collisions): shingle+sign the batch,
one equi-join against the accumulated band-row index, append.  State
lives entirely in the two parquet lakes (fingerprint index + pair log),
NOT in streaming state stores — so it survives checkpoint wipes, is
readable by batch jobs mid-stream, and has no watermark-bounded window:
a duplicate of a document ingested a year ago is still caught, which
dropDuplicatesWithinWatermark cannot do.  The trade is that this sits
in ``foreachBatch`` (exactly-once only up to the idempotence of the
sinks): re-running a failed batch re-appends band rows, which the
candidate join's dedup absorbs, and pair-log replays overwrite by
batch id — same recovery discipline as the candle lake's upsert.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from crypto_data_ingestion_module_spark.operators.incremental import ingest_batch

PAIRS_SUBDIR = "pairs"
INDEX_SUBDIR = "fingerprints"


def stream_dedup_ingest(
    source: DataFrame,
    lake_root: str,
    checkpoint: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming dedup ingestion.

    ``lake_root`` gains two tables: ``fingerprints/`` (banded MinHash
    index, append-only) and ``pairs/`` (near-dup pair log, partitioned
    by micro-batch id so a replayed batch OVERWRITES its own partition
    instead of duplicating pairs — dynamic partition overwrite is set
    session-wide by ``session.configure``).
    """
    index_path = os.path.join(lake_root, INDEX_SUBDIR)
    pairs_path = os.path.join(lake_root, PAIRS_SUBDIR)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pairs = ingest_batch(
            batch_df.sparkSession,
            index_path,
            batch_df,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            text_col=text_col,
            id_col=id_col,
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # per-write dynamic mode: replaying batch N must replace
            # ONLY partition batch_id=N even on a consumer session that
            # never ran session.configure (static mode would wipe the
            # whole pair log — the exact bug the upsert sink once had)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_path)
        )

    writer = source.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pair_log(spark: SparkSession, lake_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(lake_root, PAIRS_SUBDIR))


def read_fingerprint_index(spark: SparkSession, lake_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(lake_root, INDEX_SUBDIR))
