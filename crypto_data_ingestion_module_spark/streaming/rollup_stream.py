"""Streaming continuous aggregate: tick stream → incremental candle lake.

``operators.rollup`` in ``foreachBatch``: every micro-batch merges its
algebraic candle partials into the touched date partitions only.  This
is the third maintenance discipline the streaming layer offers, and the
one the others can't replace:

- ``streaming.stateful`` builds candles in STATE STORES — lowest
  latency, but state is watermark-bounded and lost to the checkpoint.
- ``streaming.live`` keep-last-MERGES already-final candle rows.
- this module maintains candles AS AGGREGATES of raw ticks with no
  watermark bound at all: a tick arriving a month late still lands in
  its bucket, because merge is associative and the bucket's partial is
  re-merged, not overwritten — the continuous-aggregate pattern of
  timeseries stores applied to the reference's candle lake
  (crypto_collector.py:523-558 save path, re-expressed as maintenance).

Exactly-once: foreachBatch is at-least-once, and partial-merging is
additive, so idempotence comes from ``maintain_rollup``'s applied-batch
markers — a replayed batch id is a no-op by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from crypto_data_ingestion_module_spark.operators.rollup import (
    maintain_rollup,
    maintain_rollup_snapshot,
)


def stream_rollup(
    source: DataFrame,
    lake_root: str,
    checkpoint: str,
    interval_ms: int,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    price_col: str = "value",
    volume_col: str | None = None,
    tiebreak_col: str = "event_id",
    available_now: bool = True,
    backend: str = "markers",
) -> StreamingQuery:
    """Start continuous candle maintenance over a tick stream.

    ``backend`` picks the lake's durability discipline: ``"markers"``
    commits each touched DATE PARTITION by marker-file + directory
    rename (one rename per touched date — fine when batches touch few
    dates); ``"snapshot"`` commits every batch as ONE atomic manifest
    swap on the snapshot lake (``maintain_rollup_snapshot``) — the
    right choice when a batch's calendar span is wide, since the
    commit cost is independent of how many dates it touches.  Replay
    idempotence holds in both (per-date markers vs the manifest's
    applied-ids ledger), so at-least-once foreachBatch delivery never
    double-merges.
    """
    if backend not in ("markers", "snapshot"):
        raise ValueError(f"unknown rollup backend: {backend!r}")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        maintain = (
            maintain_rollup if backend == "markers" else maintain_rollup_snapshot
        )
        maintain(
            batch_df.sparkSession,
            batch_df,
            lake_root,
            interval_ms,
            batch_id=batch_id,
            keys=keys,
            ts_col=ts_col,
            price_col=price_col,
            volume_col=volume_col,
            tiebreak_col=tiebreak_col,
        )

    writer = source.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
