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
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from crypto_data_ingestion_module_spark.streaming.stateful import (
    EMPTY_CANDLE,
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    finalized_candle,
    fold_ticks,
    with_candle_columns,
)


class CandleProcessor(StatefulProcessor):
    """Per-(symbol, bucket) OHLCV accumulator with exactly-once emission.

    State slot ``candle``: the shared ``stateful.STATE_SCHEMA`` tuple —
    open/close carry their (event time, tick_id) so ties resolve
    deterministically for any arrival order, volume is exact integer
    micro-units.  A single event-time timer at bucket-end finalizes the
    candle once the watermark (event time − lateness) passes it.
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
            acc = self._state.get()
        else:
            acc = EMPTY_CANDLE
            # first sight of this bucket: one timer at bucket end; the
            # event-time timer fires when the WATERMARK passes it, so
            # lateness is already accounted for
            bucket_end_ms = (
                int(pd.Timestamp(bucket_ts).value // 1_000_000) + self._interval_ms
            )
            self._handle.registerTimer(bucket_end_ms)

        for pdf in rows:
            acc = fold_ticks(acc, pdf)

        self._state.update(acc)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        symbol, bucket_ts = key
        if not self._state.exists():
            return
        acc = self._state.get()
        self._state.clear()
        yield finalized_candle(symbol, bucket_ts, acc)

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

    with_bucket = with_candle_columns(ticks, interval_ms, lateness, ts_col)
    return with_bucket.groupBy("symbol", "bucket_ts").transformWithStateInPandas(
        CandleProcessor(interval_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
