"""Per-exchange raw-kline normalization (P1/P2/P3/P5/P7) → canonical candles.

The reference normalizes each venue's kline layout into the canonical dict
shape row-by-row in Python (crypto_collector.py:121-131 Coinbase, 202-213
Bitstamp, 279-290 Bitfinex, 359-369 Kucoin, 444-459 Binance.US).  Here each
dialect is a pure column projection over an ``array<string>`` (or struct)
raw column — select + cast only, fully inside whole-stage codegen, so
normalization is free relative to the scan at any scale.

Layouts (FIXTURES.md §2):
- coinbase:  [ts_s,  low, high, open, close, volume]         (121-131)
- bitstamp:  {timestamp, open, high, low, close, volume}     (202-213)
- bitfinex:  [ts_ms, open, close, high, low, volume]         (279-290)
- kucoin:    [ts_s,  open, close, high, low, volume, turnover→dropped] (359-369)
- binanceus: [open_time_ms, open, high, low, close, volume, +6 dropped] (444-459)

Values may arrive as JSON numbers or strings (Binance returns strings) —
everything casts through string→double.  ``strict=False`` switches to
``try_cast`` so malformed rows become NULLs for quarantine instead of
failing the task (reference logs & drops the whole batch, 136-138; we
keep the good rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cast(c: Column, strict: bool) -> Column:
    return c.cast("double") if strict else c.try_cast("double")


def _long(c: Column, strict: bool) -> Column:
    return c.cast("long") if strict else c.try_cast("long")


def _canonical(
    ts: Column,
    o: Column,
    h: Column,
    lo: Column,
    cl: Column,
    vol: Column,
    symbol: Column,
    exchange: str,
    extra: tuple[str, ...] = (),
) -> list[Column]:
    return [
        o.alias("open"),
        h.alias("high"),
        lo.alias("low"),
        cl.alias("close"),
        vol.alias("volume"),
        ts.alias("timestamp"),
        symbol.alias("symbol"),
        F.lit(exchange).alias("exchange"),
        *[F.col(c) for c in extra],
    ]


def normalize_coinbase(
    df: DataFrame, raw_col: str = "kline", symbol_col: str = "symbol", strict: bool = True, extra: tuple[str, ...] = ()
) -> DataFrame:
    k, s = F.col(raw_col), F.col(symbol_col)
    return df.select(
        *_canonical(
            F.timestamp_seconds(_long(k[0], strict)),
            _cast(k[3], strict),
            _cast(k[2], strict),
            _cast(k[1], strict),
            _cast(k[4], strict),
            _cast(k[5], strict),
            s,
            "coinbase",
            extra,
        )
    )


def normalize_bitstamp(
    df: DataFrame, raw_col: str = "ohlc", symbol_col: str = "symbol", strict: bool = True, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Bitstamp returns named string fields (202-213)."""
    r, s = F.col(raw_col), F.col(symbol_col)
    return df.select(
        *_canonical(
            F.timestamp_seconds(_long(r["timestamp"], strict)),
            _cast(r["open"], strict),
            _cast(r["high"], strict),
            _cast(r["low"], strict),
            _cast(r["close"], strict),
            _cast(r["volume"], strict),
            s,
            "bitstamp",
            extra,
        )
    )


def normalize_bitfinex(
    df: DataFrame, raw_col: str = "kline", symbol_col: str = "symbol", strict: bool = True, extra: tuple[str, ...] = ()
) -> DataFrame:
    k, s = F.col(raw_col), F.col(symbol_col)
    return df.select(
        *_canonical(
            F.timestamp_millis(_long(k[0], strict)),
            _cast(k[1], strict),
            _cast(k[3], strict),
            _cast(k[4], strict),
            _cast(k[2], strict),
            _cast(k[5], strict),
            s,
            "bitfinex",
            extra,
        )
    )


def normalize_kucoin(
    df: DataFrame, raw_col: str = "kline", symbol_col: str = "symbol", strict: bool = True, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Kucoin: string values; trailing turnover field dropped (359-369)."""
    k, s = F.col(raw_col), F.col(symbol_col)
    return df.select(
        *_canonical(
            F.timestamp_seconds(_long(k[0], strict)),
            _cast(k[1], strict),
            _cast(k[3], strict),
            _cast(k[4], strict),
            _cast(k[2], strict),
            _cast(k[5], strict),
            s,
            "kucoin",
            extra,
        )
    )


def normalize_binanceus(
    df: DataFrame, raw_col: str = "kline", symbol_col: str = "symbol", strict: bool = True, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Binance.US 12-field kline; 6 trailing fields dropped (444-459)."""
    k, s = F.col(raw_col), F.col(symbol_col)
    return df.select(
        *_canonical(
            F.timestamp_millis(_long(k[0], strict)),
            _cast(k[1], strict),
            _cast(k[2], strict),
            _cast(k[3], strict),
            _cast(k[4], strict),
            _cast(k[5], strict),
            s,
            "binanceus",
            extra,
        )
    )


NORMALIZERS = {
    "coinbase": normalize_coinbase,
    "bitstamp": normalize_bitstamp,
    "bitfinex": normalize_bitfinex,
    "kucoin": normalize_kucoin,
    "binanceus": normalize_binanceus,
}
