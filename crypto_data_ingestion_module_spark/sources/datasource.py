"""Spark 4 Python DataSource binding for the exchange candle source (S1-S5).

``spark.read.format("crypto_candles")`` — the DataSourceV2-style native
integration: each fetch task (one manifest row) becomes an input
partition, so the scan parallelizes across executors exactly like the
mapInPandas kernel, but through Spark's source API: the relation
composes with any downstream DataFrame op, and Catalyst sees a real scan.

Usage::

    spark.dataSource.register(CryptoCandleDataSource)
    df = (spark.read.format("crypto_candles")
          .option("symbols", "BTC-USDT,ETH-USDT")
          .option("intervals", "1d,6h")
          .option("start_ms", "1704067200000")
          .option("end_ms", "1704499200000")
          .load())

The offline build wires the deterministic mock adapter; a live
deployment swaps ``_adapter()`` for the HTTP binding (same seam as
sources.fetch).  Time-range and venue options are pushed INTO the task
grid — source-level predicate pushdown, as the reference pushes its
range params into HTTP queries (crypto_collector.py:97-100 etc.).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from crypto_data_ingestion_module_spark.functions.timeutil import (
    parse_interval_ms,
)
from crypto_data_ingestion_module_spark.sources.fetch import MockExchangeAdapter
from crypto_data_ingestion_module_spark.sources.venues import (
    AVAILABILITY,
    CANDLES_PER_DAY,
    VENUE_INTERVALS,
)

DAY_MS = 86_400_000

CANDLE_DDL = (
    "open double, high double, low double, close double, volume double, "
    "timestamp timestamp, symbol string, exchange string, interval string"
)


class CandleTask(InputPartition):
    def __init__(self, exchange, symbol, interval, native, limit, start_ms, end_ms):
        self.exchange = exchange
        self.symbol = symbol
        self.interval = interval
        self.native = native
        self.limit = limit
        self.start_ms = start_ms
        self.end_ms = end_ms


def plan_tasks(
    symbols: Sequence[str],
    intervals: Sequence[str],
    start_ms: int,
    end_ms: int,
    exchanges: Sequence[str] | None = None,
) -> list[CandleTask]:
    """Driver-side task grid: the same chunk math as sources.manifest
    (days_per_chunk sizing 638-640, availability clamp 566-572,
    unsupported intervals dropped)."""
    avail = {(e, s): ms for e, s, ms in AVAILABILITY}
    tasks: list[CandleTask] = []
    for exchange, interval, native, _gran, limit, _pace in VENUE_INTERVALS:
        if exchanges and exchange not in exchanges:
            continue
        if interval not in intervals:
            continue
        cpd = CANDLES_PER_DAY.get(interval)
        if cpd is None:
            continue
        chunk_ms = max(min(300 // cpd, 300), 1) * DAY_MS
        for symbol in symbols:
            lo = max(start_ms, avail.get((exchange, symbol), start_ms))
            t = lo
            while t < end_ms:
                hi = min(t + chunk_ms, end_ms)
                tasks.append(
                    CandleTask(exchange, symbol, interval, native, limit, t, hi)
                )
                t = hi
    return tasks


class CandleReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.options = options
        self.symbols = [s for s in options.get("symbols", "BTC-USDT").split(",") if s]
        self.intervals = [s for s in options.get("intervals", "1d").split(",") if s]
        self.start_ms = int(options.get("start_ms", "1704067200000"))
        self.end_ms = int(options.get("end_ms", "1704499200000"))
        ex = options.get("exchanges", "")
        self.exchanges = [e for e in ex.split(",") if e] or None

    def partitions(self) -> list[CandleTask]:
        return plan_tasks(
            self.symbols, self.intervals, self.start_ms, self.end_ms, self.exchanges
        )

    def read(self, part: CandleTask) -> Iterator[tuple]:
        # an empty task grid (unsupported interval, inverted range) makes
        # Spark call read(None) once — that is an empty scan, not an error
        if part is None:
            return
        import datetime as dt

        adapter = MockExchangeAdapter()
        page = adapter(
            part.exchange, part.symbol, part.native, part.start_ms, part.end_ms, part.limit
        )
        for k in page:
            ts_ms = int(k[0])
            yield (
                float(k[1]),
                float(k[2]),
                float(k[3]),
                float(k[4]),
                float(k[5]),
                dt.datetime.fromtimestamp(ts_ms / 1000, tz=dt.timezone.utc).replace(
                    tzinfo=None
                ),
                part.symbol,
                part.exchange,
                part.interval,
            )


class CandleStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch advances the time cursor one
    interval across every (venue, symbol) — the reference's live loop
    (659-717) as a *native* streaming source with replayable offsets.

    Offsets are ``{"ts": epoch_ms}``; the mock adapter is deterministic,
    so ``readBetweenOffsets`` (checkpoint recovery replay) reproduces the
    original batch exactly.
    """

    def __init__(self, options: dict):
        self.symbols = [s for s in options.get("symbols", "BTC-USDT").split(",") if s]
        self.interval = options.get("intervals", "15m").split(",")[0]
        self.start_ms = int(options.get("start_ms", "1704067200000"))
        self.end_ms = int(options.get("end_ms", str(self.start_ms + 4 * DAY_MS)))
        ex = options.get("exchanges", "")
        self.exchanges = [e for e in ex.split(",") if e] or None
        self.ivl_ms = parse_interval_ms(self.interval)

    def initialOffset(self) -> dict:  # noqa: N802
        return {"ts": self.start_ms}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        out = []
        for task in plan_tasks(self.symbols, [self.interval], lo, hi, self.exchanges):
            reader = CandleReader.__new__(CandleReader)
            out.extend(CandleReader.read(reader, task))
        return out

    def read(self, start: dict):  # noqa: N802
        lo = int(start["ts"])
        if lo >= self.end_ms:  # bounded demo stream: idle at the end
            return iter([]), {"ts": lo}
        hi = min(lo + self.ivl_ms, self.end_ms)
        return iter(self._rows(lo, hi)), {"ts": hi}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter(self._rows(int(start["ts"]), int(end["ts"])))

    def commit(self, end: dict) -> None:  # noqa: N802
        pass


class CryptoCandleDataSource(DataSource):
    """``format("crypto_candles")`` — candle scan as a first-class source,
    batch (``spark.read``) and streaming (``spark.readStream``)."""

    @classmethod
    def name(cls) -> str:
        return "crypto_candles"

    def schema(self) -> str:
        return CANDLE_DDL

    def reader(self, schema: StructType) -> CandleReader:
        return CandleReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> CandleStreamReader:  # noqa: N802
        return CandleStreamReader(self.options)


def register(spark) -> None:
    """Register the source, deployable from ANY launch directory.

    Two distinct Python runtimes must resolve this code:
    - executor workers → covered by configure()'s addPyFile zip;
    - the driver-side (micro-batch) source runner process, which does NOT
      see addPyFile → covered by registering the package's modules with
      cloudpickle for BY-VALUE serialization, so the pickled DataSource
      carries its own code.
    """
    import sys

    from crypto_data_ingestion_module_spark.session import configure

    configure(spark)
    try:
        from pyspark import cloudpickle

        for name, module in list(sys.modules.items()):
            if name.startswith("crypto_data_ingestion_module_spark") and module:
                cloudpickle.register_pickle_by_value(module)
    except Exception:  # pragma: no cover - older pickle fallback
        pass
    spark.dataSource.register(CryptoCandleDataSource)
