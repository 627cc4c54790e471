"""Streaming model training: per-epoch perceptron updates accumulated
from micro-batches (X4 + §2.8) — the training half of the streaming
model loop, next to serving (``plans/extensions.py``
``stream_classifier_scores``).

Why this is hash-checkable at all: the batch gang-perceptron's
per-iteration update is an associative integer SUM over examples
(``operators/linear.py`` ``miss_updates``), so an epoch that holds the
weights FIXED while micro-batches stream past produces partial update
tables that merge by addition into exactly the batch iteration's
update — for ANY split of the examples into batches.  N streamed
epochs therefore yield the bit-identical weight table to N batch
iterations, and the streaming trainer pairs against the same unrolled
MATERIALIZED-CTE oracle as ``quality_classifier_train``.

What is NOT claimed: classic ONLINE perceptron (weights updated within
the pass) is arrival-order-dependent by definition and cannot be
oracle-paired; this module implements the order-free epoch formulation
(parameter-server synchronous data parallelism — each epoch is one
drain, updates apply at the barrier).

100 TB shape: the example frame streams from the lake per epoch (the
corpus-wide feature extraction never reruns); per-batch driver traffic
is bounded by the parameter count (one partial update row per feature
bucket); the weight state is the bounded driver-side model, identical
to the batch trainer's discipline.

Reference parity: crypto_collector.py has no training surface; this is
LLM-pipeline extension territory (SURVEY §2 X4/§2.8).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from crypto_data_ingestion_module_spark.operators.linear import (
    apply_updates,
    miss_updates,
)


def stream_train_perceptron(
    spark: SparkSession,
    examples_path: str,
    schema,
    iterations: int,
    checkpoint_root: str,
    max_files_per_trigger: int = 1,
) -> dict[int, int]:
    """Train perceptron weights from a parquet landing zone of example
    rows ``(_k, fmap, y)`` (``operators/linear.py`` ``examples_frame``)
    via one availableNow drain per epoch.

    Each micro-batch contributes its bounded partial update table
    (collected driver-side inside ``foreachBatch`` — at most one row
    per feature bucket); the summed updates apply once per epoch, so
    the result equals ``train_perceptron_hashed`` at the same iteration
    count for any file/batch split.
    """
    w: dict[int, int] = {}
    for epoch in range(int(iterations)):
        frozen = dict(w)  # weights are FIXED for the whole epoch
        partials: list = []

        def _acc(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            partials.extend(miss_updates(batch_df, frozen).collect())

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(examples_path)
            .writeStream.foreachBatch(_acc)
            .option(
                "checkpointLocation",
                os.path.join(checkpoint_root, f"epoch{epoch}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        w = apply_updates(w, partials)
    return w
