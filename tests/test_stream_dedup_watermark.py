"""Bounded-state semantics of the in-stream dedup row (SURVEY T4,
round 12: `stream_dedup_within_watermark`).

The oracle-paired registry row proves the deterministic part (byte-
identical re-deliveries collapse to the original row set across
micro-batches).  These tests pin the ORDER-DEPENDENT part the oracle
cannot: what the bounded state actually does at the watermark edge,
observed behavior of Spark's dropDuplicatesWithinWatermark on
controlled micro-batches (file source, maxFilesPerTrigger=1, one file
per batch, modification-time ordering via explicit sleeps).

Timing facts pinned here (load-bearing for anyone sizing the delay):
- the watermark used by batch N is computed from data through batch
  N-1 (one-batch lag), and
- state eviction runs in the COMMIT phase, after a batch's lookups —
  so an expired key's state still dedupes arrivals in the first batch
  whose watermark passed it, and re-emission starts one batch later.
"""

import os
import time
import uuid

from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, ts_s string").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )


def _run_stream(spark, tmp_path, batches, delay="1 hour"):
    inp = os.path.join(str(tmp_path), "in")
    os.makedirs(inp, exist_ok=True)
    for rows in batches:
        _mk(spark, rows).coalesce(1).write.mode("append").parquet(inp)
        time.sleep(1.2)  # distinct modTimes → deterministic batch order
    tbl = "sdwm_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.schema(_mk(spark, []).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["k"])
        .writeStream.format("memory")
        .queryName(tbl)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r["k"], str(r["ts"])) for r in spark.table(tbl).collect()
    )


def test_within_watermark_redelivery_dedupes_across_batches(spark, tmp_path):
    out = _run_stream(
        spark,
        tmp_path,
        [
            [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:10:00")],
            [(1, "2024-01-01 00:00:00")],  # byte-identical, next batch
            [(2, "2024-01-01 00:30:00")],  # same key 20 min later (< delay)
        ],
    )
    # one row per key: cross-batch state dedupes both the identical
    # redelivery and the within-delay re-occurrence
    assert out == [
        (1, "2024-01-01 00:00:00"),
        (2, "2024-01-01 00:10:00"),
    ]


def test_beyond_watermark_identical_redelivery_is_late_filtered(
    spark, tmp_path
):
    out = _run_stream(
        spark,
        tmp_path,
        [
            [(1, "2024-01-01 00:00:00")],
            [(99, "2024-01-01 10:00:00")],  # watermark → 09:00 next batch
            [(1, "2024-01-01 00:00:00")],   # ts < watermark: LATE row
        ],
    )
    # a byte-identical redelivery can never resurface: if its key's
    # state expired, its event time is by construction below the
    # watermark and the late filter drops it — exactly-once on
    # identical redeliveries holds at ANY delay
    assert out == [
        (1, "2024-01-01 00:00:00"),
        (99, "2024-01-01 10:00:00"),
    ]


def test_expired_key_reoccurrence_is_emitted_again(spark, tmp_path):
    out = _run_stream(
        spark,
        tmp_path,
        [
            [(2, "2024-01-01 00:00:00")],   # original; state expires 01:00
            [(99, "2024-01-01 10:00:00")],  # advances watermark
            [(98, "2024-01-01 10:05:00")],  # commit phase evicts k=2 here
            [(2, "2024-01-01 09:30:00")],   # same key, ts ≥ watermark
        ],
    )
    # THE bounded-state contract: a key re-occurring with a new event
    # time more than the delay after its original, arriving after
    # eviction, is emitted AGAIN — state is O(keys within the window),
    # and this is the price.  The MERGE path (merge_upsert_keep_last)
    # is the unbounded-lateness complement.
    assert out == [
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 09:30:00"),
        (98, "2024-01-01 10:05:00"),
        (99, "2024-01-01 10:00:00"),
    ]


def test_eviction_lags_one_commit(spark, tmp_path):
    # same shape as above but WITHOUT the intermediate batch: the
    # re-occurrence arrives in the first batch whose watermark passed
    # the key, eviction has not committed yet, and the row is still
    # deduped — the one-batch lag made visible
    out = _run_stream(
        spark,
        tmp_path,
        [
            [(2, "2024-01-01 00:00:00")],
            [(99, "2024-01-01 10:00:00")],
            [(2, "2024-01-01 09:30:00")],  # state still present: deduped
        ],
    )
    assert out == [
        (2, "2024-01-01 00:00:00"),
        (99, "2024-01-01 10:00:00"),
    ]
