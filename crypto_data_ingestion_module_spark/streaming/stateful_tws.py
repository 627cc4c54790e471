"""Tick→candle builder on the Spark 4 ``transformWithStateInPandas``
StatefulProcessor API — the successor to ``applyInPandasWithState``
(same semantics as ``stateful.candles_from_ticks``, re-expressed with
typed value state + explicit event-time timers).

Why both exist: ``applyInPandasWithState`` couples "watermark passed"
to a per-key timeout baked into the update function; the
StatefulProcessor API separates concerns — ``handleInputRows`` only
folds ticks into state, ``handleExpiredTimer`` only finalizes — and
uses named, schema'd state slots (RocksDB-backed on a real cluster,
so state scales past executor memory).  At 100 TB-of-ticks scale the
state is still one small tuple per open (symbol, bucket): bounded by
symbols × (lateness / interval), independent of tick volume.

Reference anchor: owns the aggregation the reference delegates to the
venues (crypto_collector.py:119-131 normalize of venue-aggregated
candles; interval semantics 741-752).

Deployment notes:
- ``transformWithState`` requires the RocksDB state store provider —
  ``spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")``
  before starting the query (runtime conf, read at query start).
- The TWS Python state-server protocol needs ``protobuf`` (one of
  pyspark's optional deps).  Environments without it should use
  ``stateful.candles_from_ticks`` (``applyInPandasWithState``), which
  speaks the plain Arrow protocol; the matching test auto-skips.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from crypto_data_ingestion_module_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
)


class CandleProcessor(StatefulProcessor):
    """Per-(symbol, bucket) OHLCV accumulator with exactly-once emission.

    State slot ``candle``: (open_ts_us, open, high, low, close_ts_us,
    close, volume, n).  Close is by EVENT time — a late tick arriving in
    a later micro-batch never overwrites a newer close.  A single
    event-time timer at bucket-end finalizes the candle once the
    watermark (event time − lateness) passes it.
    """

    def __init__(self, interval_ms: int):
        self._interval_ms = interval_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("candle", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        _symbol, bucket_ts = key
        if self._state.exists():
            open_ts_us, o, h, lo, close_ts_us, c, v, n = self._state.get()
        else:
            open_ts_us, o, h, lo, close_ts_us, c, v, n = (
                None, None, None, None, None, None, 0.0, 0,
            )
            # first sight of this bucket: one timer at bucket end; the
            # event-time timer fires when the WATERMARK passes it, so
            # lateness is already accounted for
            bucket_end_ms = (
                int(pd.Timestamp(bucket_ts).value // 1_000_000) + self._interval_ms
            )
            self._handle.registerTimer(bucket_end_ms)

        for pdf in rows:
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
                if close_ts_us is None or t_us >= close_ts_us:
                    close_ts_us, c = int(t_us), float(p)
                v += float(q)
                n += 1

        self._state.update((open_ts_us, o, h, lo, close_ts_us, c, v, n))
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        symbol, bucket_ts = key
        if not self._state.exists():
            return
        (_open_ts_us, o, h, lo, _close_ts_us, c, v, n) = self._state.get()
        self._state.clear()
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

    def close(self) -> None:
        pass


def candles_from_ticks_tws(
    ticks: DataFrame,
    interval_ms: int = 60_000,
    lateness: str = "30 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Tick stream (symbol, ts, price, qty, tick_id) → finalized candles,
    via ``transformWithStateInPandas`` with event-time timers.

    Same contract as ``stateful.candles_from_ticks``: each candle is
    emitted exactly once, ``lateness`` after its bucket closes; late
    ticks inside the watermark still fold in.
    """
    import sys

    from crypto_data_ingestion_module_spark.functions.timeutil import bucket_start

    # transformWithState spawns a DRIVER-SIDE pre-init Python worker (state
    # schema validation) that does not see addPyFile and cannot import this
    # package — same runtime split as sources/datasource.py::register.  The
    # pickled processor must carry its own code: register the package's
    # modules for cloudpickle by-value serialization.
    try:
        from pyspark import cloudpickle

        for name, module in list(sys.modules.items()):
            if name.startswith("crypto_data_ingestion_module_spark") and module:
                cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - older pickle fallback
        pass

    with_bucket = ticks.withWatermark(ts_col, lateness).withColumn(
        "bucket_ts", bucket_start(F.col(ts_col), interval_ms)
    )
    return with_bucket.groupBy("symbol", "bucket_ts").transformWithStateInPandas(
        CandleProcessor(interval_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
