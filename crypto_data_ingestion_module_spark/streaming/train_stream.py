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


class _EpochAccumulator:
    """Per-epoch partial-update collector for ``foreachBatch``.

    Keyed by ``batch_id`` because foreachBatch is at-least-once: a
    micro-batch re-delivered after a failure must OVERWRITE its own
    slot, not append a second copy of the same partials (which would
    double-count updates and silently break the bit-identity with the
    batch trainer).  Overwriting is sound because the epoch's weights
    are frozen, so a re-run of the same batch yields the same table.
    """

    def __init__(self, frozen_weights: dict[int, int]) -> None:
        self._frozen = frozen_weights
        self._by_batch: dict[int, list] = {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self._by_batch[int(batch_id)] = miss_updates(
            batch_df, self._frozen
        ).collect()

    def partials(self) -> list:
        return [
            row
            for bid in sorted(self._by_batch)
            for row in self._by_batch[bid]
        ]


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

    Partials are keyed by ``batch_id``: foreachBatch may re-deliver a
    micro-batch after a failure (its at-least-once contract), and an
    append-only accumulator would double-count the replayed partials,
    silently breaking the bit-identity with the batch trainer.  A
    replayed batch id overwrites its own slot instead (idempotent
    because the epoch's weights are frozen, so a re-run of the same
    batch produces the same partial table).
    """
    w: dict[int, int] = {}
    for epoch in range(int(iterations)):
        # weights are FIXED for the whole epoch
        acc = _EpochAccumulator(dict(w))
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(examples_path)
            .writeStream.foreachBatch(acc)
            .option(
                "checkpointLocation",
                os.path.join(checkpoint_root, f"epoch{epoch}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        w = apply_updates(w, acc.partials())
    return w
