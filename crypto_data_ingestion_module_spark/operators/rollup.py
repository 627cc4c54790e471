"""Incremental OHLCV rollup maintenance (continuous aggregate).

The reference re-fetches pre-aggregated candles per interval; a native
engine maintains coarse candles FROM fine data incrementally — the
"continuous aggregate" / materialized-view-maintenance pattern: when a
batch of ticks arrives, only the buckets it touches are re-merged, never
the whole history.

The lake stores the ALGEBRAIC PARTIAL form of each candle, not the
finalized row:

    open_s  = min(struct(ts, tiebreak, price))   -- associative
    close_s = max(struct(ts, tiebreak, price))   -- associative
    high/low, n_rows                             -- associative
    volume_u6 = sum(round(volume * 1e6)) LONG    -- associative AND exact

min/max of the ordered structs pick first/last tick no matter how ticks
were split across batches, and the micro-unit integer volume makes the
merge bit-exact regardless of merge order (a double sum would drift by
batch split — the same policy as ``plans.queries.dsum``).  Merging two
partials is the SAME aggregate as building one, so maintenance is:
partial-agg the batch → union with the stored partials of the touched
date partitions only (partition pruning does the "only" part) → re-agg →
dynamic-overwrite those partitions.  ``finalize`` projects the partial
form to the user-facing OHLCV row.

Replay safety: merging is additive, so at-least-once delivery would
double-count; ``maintain_rollup`` records applied batch ids in
``_applied/`` and skips repeats, making replays idempotent (the same
marker discipline as the staged lake commit).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.timeutil import bucket_start

PARTIAL_COLS = ("open_s", "high", "low", "close_s", "volume_u6", "n_rows")


def candle_partials(
    df: DataFrame,
    interval_ms: int,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    price_col: str = "value",
    volume_col: str | None = None,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Tick batch → mergeable per-bucket candle partials."""
    order_price = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.col(price_col).alias("v"),
    )
    vol = F.col(volume_col) if volume_col else F.col(price_col)
    bucket = bucket_start(F.col(ts_col), interval_ms).alias("bucket_ts")
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(
        F.min(order_price).alias("open_s"),
        F.max(F.col(price_col)).alias("high"),
        F.min(F.col(price_col)).alias("low"),
        F.max(order_price).alias("close_s"),
        F.sum(F.round(vol * 1_000_000.0).cast("long")).alias("volume_u6"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_partials(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Re-aggregate a union of partials — the identical associative ops."""
    return partials.groupBy("bucket_ts", *[F.col(k) for k in keys]).agg(
        F.min("open_s").alias("open_s"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("close_s").alias("close_s"),
        F.sum("volume_u6").alias("volume_u6"),
        F.sum("n_rows").alias("n_rows"),
    )


def finalize(partials: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Partial form → user-facing OHLCV."""
    return partials.select(
        "bucket_ts",
        *keys,
        F.col("open_s.v").alias("open"),
        "high",
        "low",
        F.col("close_s.v").alias("close"),
        (F.col("volume_u6").cast("double") / 1_000_000.0).alias("volume"),
        "n_rows",
    )


def read_rollup(spark: SparkSession, lake_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(lake_root, "partials"))


def maintain_rollup(
    spark: SparkSession,
    batch: DataFrame,
    lake_root: str,
    interval_ms: int,
    batch_id: str | int,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    price_col: str = "value",
    volume_col: str | None = None,
    tiebreak_col: str = "event_id",
) -> None:
    """Merge one tick batch into the candle rollup lake.

    Only the date partitions the batch touches are read and rewritten;
    a batch id seen before is skipped entirely (replay-idempotent).
    The touched-date list is collected driver-side — it is bounded by
    the batch's calendar span, not its size.
    """
    marker = os.path.join(lake_root, "_applied", f"batch-{batch_id}")
    if os.path.exists(marker):
        return
    path = os.path.join(lake_root, "partials")
    new = candle_partials(
        batch, interval_ms, keys, ts_col, price_col, volume_col, tiebreak_col
    ).withColumn("date", F.date_format("bucket_ts", "yyyyMMdd"))
    touched = [r.date for r in new.select("date").distinct().collect()]
    try:
        stored = spark.read.parquet(path).filter(F.col("date").isin(touched))
        merged = merge_partials(
            stored.unionByName(new), keys
        ).withColumn("date", F.date_format("bucket_ts", "yyyyMMdd"))
    except Exception:
        merged = new
    # materialize BEFORE the write: the merged plan reads the very
    # partitions the dynamic overwrite is about to replace
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(path)
    )
    os.makedirs(marker, exist_ok=True)
