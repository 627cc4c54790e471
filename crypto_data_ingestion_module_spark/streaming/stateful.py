"""Custom stateful streaming operator: incremental OHLCV candle builder
over a raw tick stream (``applyInPandasWithState``).

The reference consumes venue-pre-aggregated candles; this operator OWNS
that aggregation for tick-level feeds: per (symbol, bucket) state carries
the in-progress candle, updated Arrow-batch-at-a-time; the candle is
FINALIZED and emitted exactly once when the event-time watermark passes
the bucket end (late ticks within the watermark still fold in).

State size is one small tuple per open (symbol, bucket) — bounded by
(symbols × lateness/interval), independent of tick volume, so the
operator holds at any throughput.  This is the streaming complement of
the batch ``resample_ohlcv``: same semantics, incremental emission.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "symbol string, bucket_ts timestamp, open double, high double, "
    "low double, close double, volume double, n_ticks long"
)
STATE_SCHEMA = (
    "open_ts_us long, open double, high double, low double, "
    "close_ts_us long, close double, volume double, n long"
)


def _make_update(interval_ms: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        symbol, bucket_ts = key
        if state.hasTimedOut:
            # watermark passed the bucket: finalize exactly once
            (_open_ts_us, o, h, lo, _close_ts_us, c, v, n) = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "symbol": symbol,
                        "bucket_ts": bucket_ts,
                        "open": o,
                        "high": h,
                        "low": lo,
                        "close": c,
                        "volume": v,
                        "n_ticks": n,
                    }
                ]
            )
            return

        if state.exists:
            open_ts_us, o, h, lo, close_ts_us, c, v, n = state.get
        else:
            open_ts_us, o, h, lo, close_ts_us, c, v, n = (
                None, None, None, None, None, None, 0.0, 0,
            )

        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "tick_id"])
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()  # ns → µs
            prices = pdf["price"].to_numpy()
            qtys = pdf["qty"].to_numpy()
            for t_us, p, q in zip(ts_us, prices, qtys):
                if open_ts_us is None or t_us < open_ts_us:
                    open_ts_us, o = int(t_us), float(p)
                if h is None or p > h:
                    h = float(p)
                if lo is None or p < lo:
                    lo = float(p)
                # close by EVENT time: a late tick arriving in a later
                # micro-batch must not overwrite a newer close
                if close_ts_us is None or t_us >= close_ts_us:
                    close_ts_us, c = int(t_us), float(p)
                v += float(q)
                n += 1

        state.update((open_ts_us, o, h, lo, close_ts_us, c, v, n))
        # finalize when the watermark passes the end of this bucket
        bucket_end_ms = int(pd.Timestamp(bucket_ts).value // 1_000_000) + interval_ms
        state.setTimeoutTimestamp(bucket_end_ms)

    return update


def candles_from_ticks(
    ticks: DataFrame,
    interval_ms: int = 60_000,
    lateness: str = "30 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Tick stream (symbol, ts, price, qty, tick_id) → finalized candles.

    Event-time watermark bounds state and lateness; each candle is
    emitted exactly once, ``lateness`` after its bucket closes.
    """
    from crypto_data_ingestion_module_spark.functions.timeutil import bucket_start

    with_bucket = ticks.withWatermark(ts_col, lateness).withColumn(
        "bucket_ts", bucket_start(F.col(ts_col), interval_ms)
    )
    return with_bucket.groupBy("symbol", "bucket_ts").applyInPandasWithState(
        _make_update(interval_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
