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
double-count.  ``maintain_rollup`` therefore commits each touched DATE
PARTITION by a staged directory rename that carries an
``_applied-batch-{id}`` marker file INSIDE the partition directory —
data and marker land in one atomic rename, so the replay check ("does
this date already contain this batch?") and the data commit share one
atomic unit, per date.  A replayed batch re-merges only the dates whose
marker is absent; a crash mid-swap is repaired by the restore pass at
the next attempt (old content is parked in a deterministic per-batch
backup dir, never deleted before every swap succeeded).  All marker and
swap I/O goes through the Hadoop FS API so the discipline holds on any
lake root (HDFS, s3a via a rename-capable committer, local).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.timeutil import bucket_start

PARTIAL_COLS = (
    "open_s",
    "high",
    "low",
    "close_s",
    "volume_u6",
    "turnover_u6",
    "n_rows",
)


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
        # price x size in micro-units: the VWAP numerator is associative
        # and exact, so the continuous aggregate maintains VWAP for free.
        # (When no volume column exists vol == price and turnover/volume
        # degenerates to the price-weighted mean — unused but harmless.)
        F.sum(F.round(F.col(price_col) * vol * 1_000_000.0).cast("long")).alias(
            "turnover_u6"
        ),
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
        F.sum("turnover_u6").alias("turnover_u6"),
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
        F.when(
            F.col("volume_u6") > 0,
            F.col("turnover_u6").cast("double")
            / F.col("volume_u6").cast("double"),
        ).alias("vwap"),
        "n_rows",
    )


def cascade_partials(
    partials: DataFrame,
    finer_ms: int,
    coarser_ms: int,
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Derive COARSER candle partials from finer ones — the materialized-
    view hierarchy (1m lake feeds 1h feeds 1d) without touching raw ticks.

    Exact by construction: open_s/close_s carry the full (ts, tiebreak,
    price) order key, so min/max at the coarser bucket still pick the
    true first/last tick; volume/turnover/n_rows are associative integer
    sums.  The coarser grid MUST be a multiple of the finer one — a fine
    bucket straddling two coarse buckets would be silently floored whole
    into the earlier one — so divisibility is a hard precondition, not a
    convention.
    """
    if coarser_ms % finer_ms != 0:
        raise ValueError(
            f"coarser interval {coarser_ms} is not a multiple of the "
            f"stored interval {finer_ms}: fine buckets would straddle "
            "coarse boundaries"
        )
    rebucketed = partials.withColumn(
        "bucket_ts", bucket_start(F.col("bucket_ts"), coarser_ms)
    )
    return merge_partials(rebucketed, keys)


def read_rollup(spark: SparkSession, lake_root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(lake_root, "partials"))


def maintain_rollup_snapshot(
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
) -> int:
    """Rollup maintenance over the SNAPSHOT lake — the unified-lake twin
    of :func:`maintain_rollup` (VERDICT r4 item 5).

    Same algebra (partial-agg the batch, re-merge only the touched date
    partitions), but durability and replay come from the snapshot
    manifest instead of marker files + directory renames:

    * the touched dates' stored partials are read through the manifest
      (file-pruned, never a full-lake scan),
    * the commit is ONE atomic manifest swap — there is no per-date
      partial-application window at all (the marker design could apply
      some dates and crash before others; here a crash before commit
      applies nothing and replay redoes everything),
    * replay idempotence is the manifest's ``applied_ids`` ledger: a
      re-delivered ``batch_id`` is a no-op without reading any data,
    * concurrent maintainers get optimistic retry + snapshot-isolated
      readers for free.

    Returns the committed snapshot version.
    """
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_merge_partitions,
    )

    new = candle_partials(
        batch, interval_ms, keys, ts_col, price_col, volume_col, tiebreak_col
    ).withColumn("date", F.date_format("bucket_ts", "yyyyMMdd"))

    def _merge(current: DataFrame | None, incoming: DataFrame) -> DataFrame:
        if current is None:
            return incoming
        return merge_partials(
            current.drop("date").unionByName(incoming.drop("date")),
            keys,
        ).withColumn("date", F.date_format("bucket_ts", "yyyyMMdd"))

    return snapshot_merge_partitions(
        spark,
        lake_root,
        new,
        _merge,
        partition_cols=("date",),
        applied_id=f"rollup-{batch_id}",
        ts_col="bucket_ts",
    )


def read_rollup_snapshot(
    spark: SparkSession, lake_root: str, version: int | None = None
) -> DataFrame:
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        read_snapshot,
    )

    return read_snapshot(spark, lake_root, version, ts_col="bucket_ts")


def _fs(spark: SparkSession, path_str: str):
    """(Path class, FileSystem) via the Hadoop FS API — the lake root may
    be any Hadoop-supported filesystem, not just local."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return jvm.org.apache.hadoop.fs.Path, p.getFileSystem(
        spark._jsc.hadoopConfiguration()
    )


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

    Only the date partitions the batch touches are read and rewritten.
    The touched-date list is collected driver-side — it is bounded by
    the batch's calendar span, not its size.

    Replay idempotence is per DATE PARTITION: the staged content of each
    touched date carries an ``_applied-batch-{id}`` marker file (parquet
    readers ignore ``_``-prefixed files), and the directory rename that
    promotes the partition moves data + marker atomically.  A replay
    re-merges exactly the dates whose marker is missing; markers of
    previously applied batches are carried forward into the staged dir
    before the swap, so older replays stay skipped too.  A crash between
    "old content parked in backup" and "staged content renamed in" is
    repaired by the restore pass below at the next attempt of the same
    batch — backup dirs are deterministic per batch id and deleted only
    after every swap succeeded.
    """
    path = f"{lake_root.rstrip('/')}/partials"
    Path, fs = _fs(spark, lake_root)
    staging = f"{lake_root.rstrip('/')}/_staging/batch-{batch_id}"
    backup = f"{lake_root.rstrip('/')}/_backup/batch-{batch_id}"

    # Restore pass: a previous attempt of THIS batch may have crashed
    # after parking a date's old content in backup but before promoting
    # the staged replacement — that date is missing from the lake and its
    # pre-batch content lives only in backup.  Move it back before
    # recomputing, so the merge below sees the full pre-batch state.
    if fs.exists(Path(backup)):
        for st in fs.listStatus(Path(backup)):
            name = st.getPath().getName()  # date=YYYYMMDD
            if name.startswith("date=") and not fs.exists(Path(f"{path}/{name}")):
                fs.mkdirs(Path(path))
                fs.rename(st.getPath(), Path(f"{path}/{name}"))

    new = candle_partials(
        batch, interval_ms, keys, ts_col, price_col, volume_col, tiebreak_col
    ).withColumn("date", F.date_format("bucket_ts", "yyyyMMdd"))
    touched = [r.date for r in new.select("date").distinct().collect()]
    marker_name = f"_applied-batch-{batch_id}"
    pending = [
        d for d in touched if not fs.exists(Path(f"{path}/date={d}/{marker_name}"))
    ]
    if not pending:
        # fully applied (or empty batch): only leftover dirs to clean
        fs.delete(Path(staging), True)
        fs.delete(Path(backup), True)
        return
    new = new.filter(F.col("date").isin(pending))

    # Existence is checked explicitly — any OTHER read failure (corrupt
    # footer, FS hiccup, permissions) must propagate, never be mistaken
    # for "lake does not exist yet" (that would silently replace the
    # accumulated history of the touched dates with this batch alone).
    if fs.exists(Path(path)):
        stored = spark.read.parquet(path).filter(F.col("date").isin(pending))
        merged = merge_partials(
            stored.unionByName(new), keys
        ).withColumn("date", F.date_format("bucket_ts", "yyyyMMdd"))
    else:
        merged = new

    merged.write.mode("overwrite").partitionBy("date").parquet(staging)

    # Per-date atomic promote: stage markers (new + carried-forward),
    # park old content in backup, rename staged dir in.
    for d in pending:
        src = Path(f"{staging}/date={d}")
        if not fs.exists(src):
            continue
        fs.createNewFile(Path(f"{staging}/date={d}/{marker_name}"))
        dst = Path(f"{path}/date={d}")
        if fs.exists(dst):
            for st in fs.listStatus(dst):
                nm = st.getPath().getName()
                if nm.startswith("_applied-batch-") and nm != marker_name:
                    fs.createNewFile(Path(f"{staging}/date={d}/{nm}"))
            fs.mkdirs(Path(backup))
            fs.rename(dst, Path(f"{backup}/date={d}"))
        else:
            fs.mkdirs(Path(path))
        fs.rename(src, dst)
    fs.delete(Path(staging), True)
    fs.delete(Path(backup), True)
