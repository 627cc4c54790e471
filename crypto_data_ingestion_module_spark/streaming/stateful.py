"""Custom stateful streaming operator: incremental OHLCV candle builder
over a raw tick stream (``applyInPandasWithState``).

The reference consumes venue-pre-aggregated candles; this operator OWNS
that aggregation for tick-level feeds: per (symbol, bucket) state carries
the in-progress candle, updated Arrow-batch-at-a-time; the candle is
FINALIZED and emitted exactly once when the event-time watermark passes
the bucket end (late ticks within the watermark still fold in).

Determinism contract (what makes the operator oracle-pairable): the
fold is independent of batch/chunk split and arrival order —

- open/close tiebreak LEXICOGRAPHICALLY on (event time, tick_id), so a
  redelivered or late tick with an equal timestamp lands the same way
  no matter which micro-batch carried it;
- volume accumulates in exact integer micro-units.  The per-tick
  ``qty_micro = round(qty * 1e6)`` conversion happens JVM-side (the
  ``dsum`` fixed-point policy from ``plans.queries``) so no Python
  rounding re-implementation can drift from the engines'.

State size is one small tuple per open (symbol, bucket) — bounded by
(symbols × lateness/interval), independent of tick volume, so the
operator holds at any throughput.  This is the streaming complement of
the batch ``resample_ohlcv``: same semantics, incremental emission.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "symbol string, bucket_ts timestamp, open double, high double, "
    "low double, close double, volume double, n_ticks long"
)
STATE_SCHEMA = (
    "open_ts_us long, open_tick long, open double, high double, "
    "low double, close_ts_us long, close_tick long, close double, "
    "volume_micro long, n long"
)

#: (open_ts_us, open_tick, open, high, low, close_ts_us, close_tick,
#:  close, volume_micro, n)
EMPTY_CANDLE = (None, None, None, None, None, None, None, None, 0, 0)


def fold_ticks(acc: tuple, pdf: pd.DataFrame) -> tuple:
    """Fold one Arrow chunk of ticks into a candle accumulator —
    vectorized, and associative/commutative over chunks: the lexsorted
    (ts, tick_id) extremes pick open/close, min/max pick low/high, and
    the micro-unit volume is an integer sum, so ANY regrouping of rows
    into chunks or micro-batches folds to the identical candle.
    """
    if len(pdf) == 0:
        return acc
    (open_ts, open_tid, o, h, lo, close_ts, close_tid, c, vm, n) = acc
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()  # ns → µs
    tids = pdf["tick_id"].to_numpy()
    prices = pdf["price"].to_numpy()
    order = np.lexsort((tids, ts_us))
    i0, i1 = order[0], order[-1]
    first = (int(ts_us[i0]), int(tids[i0]))
    last = (int(ts_us[i1]), int(tids[i1]))
    if open_ts is None or first < (open_ts, open_tid):
        (open_ts, open_tid), o = first, float(prices[i0])
    if close_ts is None or last > (close_ts, close_tid):
        (close_ts, close_tid), c = last, float(prices[i1])
    pmax, pmin = float(prices.max()), float(prices.min())
    h = pmax if h is None else max(h, pmax)
    lo = pmin if lo is None else min(lo, pmin)
    vm += int(pdf["qty_micro"].to_numpy().sum())
    n += len(pdf)
    return (open_ts, open_tid, o, h, lo, close_ts, close_tid, c, vm, n)


def finalized_candle(symbol, bucket_ts, acc: tuple) -> pd.DataFrame:
    """One finalized-candle output row from an accumulator."""
    (_ots, _otid, o, h, lo, _cts, _ctid, c, vm, n) = acc
    return pd.DataFrame(
        [
            {
                "symbol": symbol,
                "bucket_ts": bucket_ts,
                "open": o,
                "high": h,
                "low": lo,
                "close": c,
                "volume": vm / 1_000_000.0,
                "n_ticks": n,
            }
        ]
    )


def with_candle_columns(
    ticks: DataFrame, interval_ms: int, lateness: str, ts_col: str
) -> DataFrame:
    """Shared pre-state projection: watermark, bucket assignment, and
    the JVM-side micro-unit qty (``F.round`` HALF_UP — identical to the
    ``dsum``/oracle fixed-point rounding, unlike any Python round)."""
    from crypto_data_ingestion_module_spark.functions.timeutil import bucket_start

    return (
        ticks.withWatermark(ts_col, lateness)
        .withColumn("bucket_ts", bucket_start(F.col(ts_col), interval_ms))
        .withColumn(
            "qty_micro", F.round(F.col("qty") * 1_000_000.0).cast("long")
        )
    )


def _make_update(interval_ms: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        symbol, bucket_ts = key
        if state.hasTimedOut:
            # watermark passed the bucket: finalize exactly once
            acc = state.get
            state.remove()
            yield finalized_candle(symbol, bucket_ts, acc)
            return

        acc = state.get if state.exists else EMPTY_CANDLE
        for pdf in pdfs:
            acc = fold_ticks(acc, pdf)

        state.update(acc)
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
    with_bucket = with_candle_columns(ticks, interval_ms, lateness, ts_col)
    return with_bucket.groupBy("symbol", "bucket_ts").applyInPandasWithState(
        _make_update(interval_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
