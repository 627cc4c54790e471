"""Streaming end-to-end capstone (VERDICT r4 item 7): the native Python
streaming DataSource (mock transport) feeds one foreachBatch sink that
normalizes and MERGEs candles into the snapshot lake, maintains the
incremental candle rollup over a bucket that STRADDLES micro-batches,
and appends to the IVF-PQ index with frozen quantizers — then the final
state of all three stores must equal the one-shot batch pipeline over
the same payloads, and a replayed micro-batch must change nothing."""

import time

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.rollup import (
    candle_partials,
    finalize,
    maintain_rollup_snapshot,
    read_rollup_snapshot,
)
from crypto_data_ingestion_module_spark.sinks.snapshot import (
    current_version,
    read_snapshot,
    snapshot_upsert,
)
from crypto_data_ingestion_module_spark.sources.datasource import register
from crypto_data_ingestion_module_spark.streaming.ann_stream import (
    index_batch,
    read_index,
)

DAY_MS = 86_400_000
IVL_MS = 6 * 3_600_000
START_MS = 1_704_067_200_000  # 2024-01-01 UTC
END_MS = START_MS + 2 * DAY_MS
# daily rollup buckets over a 6h stream: each bucket merges FOUR
# micro-batches' partials — the cross-batch continuous-aggregate case
ROLL_IVL = DAY_MS

_ANN = dict(n_lists=2, m=4, k_codes=4, dim=8)


def _source(reader):
    return (
        reader.format("crypto_candles")
        .option("symbols", "BTC-USDT")
        .option("intervals", "6h")
        .option("start_ms", str(START_MS))
        .option("end_ms", str(END_MS))
        .load()
    )


def _embeddings(candles):
    """Deterministic per-candle feature vector — the multimodal seam of
    this test: any per-row embedding works, it only has to be identical
    between the streamed and batch paths."""
    ex_idx = (
        F.when(F.col("exchange") == "coinbase", 0)
        .when(F.col("exchange") == "bitstamp", 1)
        .when(F.col("exchange") == "bitfinex", 2)
        .when(F.col("exchange") == "kucoin", 3)
        .otherwise(4)
    )
    return candles.select(
        (F.unix_millis("timestamp") * 10 + ex_idx).alias("vec_id"),
        F.array(
            "open",
            "high",
            "low",
            "close",
            "volume",
            (F.col("close") - F.col("open")).alias("d1"),
            (F.col("high") - F.col("low")).alias("d2"),
            ex_idx.cast("double").alias("d3"),
        ).alias("embedding"),
    )


def _candle_state(df):
    return sorted(
        (r.symbol, r.exchange, r.timestamp, r.open, r.close, r.volume)
        for r in df.collect()
    )


def _rollup_state(df):
    return sorted(
        (r.bucket_ts, r.symbol, r.exchange, r.open, r.high, r.low, r.close,
         round(r.volume, 6), r.n_rows)
        for r in df.collect()
    )


def _index_state(df):
    return sorted(
        (r.nid, r.list_id, tuple(r.codes))
        for r in df.select("nid", "list_id", "codes").collect()
    )


def test_streaming_e2e_capstone(spark, tmp_path):
    register(spark)
    lake = str(tmp_path / "candles")
    roll = str(tmp_path / "rollup")
    ann = str(tmp_path / "ann")

    # the frozen quantizers' reference corpus: the full expected payload,
    # known up front from the batch side of the same deterministic source
    batch_candles = _source(spark.read).withColumn("data_type", F.lit("spot"))
    ref = _embeddings(batch_candles)

    def _sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        candles = batch_df.withColumn("data_type", F.lit("spot"))
        snapshot_upsert(
            sess, candles, lake, applied_id=f"e2e-cand-{batch_id}"
        )
        maintain_rollup_snapshot(
            sess,
            candles,
            roll,
            ROLL_IVL,
            batch_id=f"e2e-roll-{batch_id}",
            keys=("symbol", "exchange"),
            ts_col="timestamp",
            price_col="close",
            volume_col="volume",
            tiebreak_col="timestamp",
        )
        index_batch(
            _embeddings(candles), ref, ann, batch_id, **_ANN
        )

    q = (
        _source(spark.readStream)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    # poll the LAST store the sink writes (the ANN index): when it holds
    # every vector, all three stores of every micro-batch are committed
    n_expect = batch_candles.count()
    deadline = time.time() + 150
    while time.time() < deadline:
        try:
            if read_index(spark, ann).count() >= n_expect:
                break
        except Exception:
            pass
        time.sleep(1)
    q.stop()

    # ---- candle lake ≡ batch read of the same deterministic source ----
    got = read_snapshot(spark, lake)
    assert _candle_state(got) == _candle_state(batch_candles)
    assert got.count() == n_expect

    # ---- rollup ≡ one-shot partial-agg over the full payload ----
    # each daily bucket only finalizes correctly if the cross-batch
    # merge combined the partials of its four 6h micro-batches
    want_roll = finalize(
        candle_partials(
            batch_candles,
            ROLL_IVL,
            keys=("symbol", "exchange"),
            ts_col="timestamp",
            price_col="close",
            volume_col="volume",
            tiebreak_col="timestamp",
        ),
        ["symbol", "exchange"],
    )
    got_roll = finalize(read_rollup_snapshot(spark, roll), ["symbol", "exchange"])
    assert _rollup_state(got_roll) == _rollup_state(want_roll)
    # every (day, venue) bucket merged its four 6h micro-batch partials
    assert got_roll.count() > 0
    assert all(r.n_rows == 4 for r in got_roll.collect())

    # ---- IVF-PQ index ≡ batch-built index (frozen quantizers) ----
    batch_ann = str(tmp_path / "ann_batch")
    index_batch(ref, ref, batch_ann, "all", **_ANN)
    assert _index_state(read_index(spark, ann)) == _index_state(
        read_index(spark, batch_ann)
    )

    # ---- replayed micro-batch: ledger no-ops + idempotent overwrite ----
    v_lake, v_roll = current_version(spark, lake), current_version(spark, roll)
    first = batch_candles.filter(
        F.col("timestamp") < F.expr(f"timestamp_millis({START_MS + IVL_MS})")
    ).drop("data_type")
    _sink(first, 0)
    assert current_version(spark, lake) == v_lake
    assert current_version(spark, roll) == v_roll
    assert _candle_state(read_snapshot(spark, lake)) == _candle_state(
        batch_candles
    )
    assert _index_state(read_index(spark, ann)) == _index_state(
        read_index(spark, batch_ann)
    )
