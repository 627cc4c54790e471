"""Incremental ANN-index maintenance: stream embeddings into an IVF-PQ
index lake.

The serving index (sinks/ann_lake) was batch-built; a growing corpus
needs its index to grow WITHOUT retraining or re-encoding what is
already indexed.  Standard discipline (FAISS/Milvus alike): the
quantizers are FROZEN — coarse centroids and PQ codebooks come from a
reference corpus and are retrained offline when drift warrants — and
each arriving batch is encoded against them and appended to its lists.

foreachBatch per micro-batch:
- assign each new vector's ``list_id`` (frozen seeded centroids), and
- PQ-encode it (frozen seeded codebooks),
then append ``(nid, list_id, codes)`` — the ~32x-compressed serving form
— under a batch-id-deterministic directory, so at-least-once replays
overwrite their own output instead of duplicating rows (the same
idempotence discipline as streaming/dedup_stream's pair log).

Because the quantizers are frozen, streaming N batches produces
EXACTLY the rows batch-encoding their union would (pinned by test) —
the index never forks from its batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def index_batch(
    batch: DataFrame,
    reference: DataFrame,
    lake_root: str,
    batch_id: int | str,
    n_lists: int = 16,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    backend: str = "snapshot",
) -> None:
    """Encode + assign one batch against the frozen quantizers and append
    it to the index lake (idempotent per batch id).

    ``backend="snapshot"`` (default): the append is one snapshot commit
    partitioned by ``list_id``, with the batch id in the manifest's
    replay ledger — a re-delivered batch appends NOTHING, and searchers
    scanning the index mid-append see a whole version, never a partial
    batch.  ``backend="swap"`` keeps the batch-id-deterministic
    directory layout (replay overwrites its own dir)."""
    from crypto_data_ingestion_module_spark.operators.pq import (
        pq_encode,
        seeded_codebook,
    )
    from crypto_data_ingestion_module_spark.operators.similarity import (
        _ivf_seed_assign_normed,
        _seed_centroids,
        with_norm,
    )

    ref = with_norm(
        reference.select(
            F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
        ),
        "nv",
        exact=True,
        long_safe=True,
    ).withColumnRenamed("_norm", "nnorm")
    cent = _seed_centroids(ref, n_lists)
    cb = seeded_codebook(reference, m, k_codes, vec_col, id_col)

    new = with_norm(
        batch.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")),
        "nv",
        exact=True,
        long_safe=True,
    ).withColumnRenamed("_norm", "nnorm")
    assigned = _ivf_seed_assign_normed(new, cent, True).select(
        "nid", "list_id"
    )
    codes = (
        pq_encode(batch, cb, m, vec_col, id_col, dim)
        .groupBy("nid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("j"), F.col("code")))
            ).alias("_c")
        )
        .select(
            "nid", F.transform(F.col("_c"), lambda s: s["code"]).alias("codes")
        )
    )
    out = assigned.join(codes, "nid")
    if backend == "snapshot":
        from crypto_data_ingestion_module_spark.sinks.snapshot import (
            snapshot_append,
        )

        snapshot_append(
            batch.sparkSession,
            lake_root,
            out,
            partition_cols=("list_id",),
            applied_id=f"ann-{batch_id}",
            ts_col="_no_ts",
        )
    else:
        # batch-id-deterministic dir: a replayed batch overwrites itself
        out.write.mode("overwrite").parquet(
            f"{lake_root.rstrip('/')}/batch-{batch_id}"
        )


def read_index(spark: SparkSession, lake_root: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        current_version,
        read_snapshot,
    )

    if current_version(spark, lake_root) is not None:
        return read_snapshot(spark, lake_root)
    return spark.read.parquet(f"{lake_root.rstrip('/')}/batch-*")


def stream_index_embeddings(
    source: DataFrame,
    reference: DataFrame,
    lake_root: str,
    checkpoint: str,
    n_lists: int = 16,
    m: int = 8,
    k_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Start incremental index maintenance over an embedding stream."""
    from crypto_data_ingestion_module_spark.streaming.identity import (
        stream_qid,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # stream-scoped batch identity (see streaming/identity.py)
        qid = stream_qid(checkpoint)
        index_batch(
            batch_df,
            reference,
            lake_root,
            f"{qid}-{batch_id}",
            n_lists,
            m,
            k_codes,
            vec_col,
            id_col,
            dim,
        )

    writer = source.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
