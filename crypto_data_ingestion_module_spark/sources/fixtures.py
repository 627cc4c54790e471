"""Canned raw exchange payloads (FIXTURES.md §2) — deterministic, no
network.  One set of klines per exchange dialect, exercising: mixed
number/string values, seconds vs milliseconds epochs, reversed row order,
extra trailing fields, and the named-field Bitstamp shape.

Shared by the oracle-paired ``normalize_candles`` query, the unit tests,
and the mock fetch adapter.
"""

from __future__ import annotations

# [ts_s, low, high, open, close, volume] — newest-first (reader reverses)
COINBASE_KLINES: list[list[str]] = [
    ["1704068100", "42080.0", "42200.0", "42085.5", "42150.0", "8.25"],
    ["1704067200", "42000.5", "42100.0", "42050.25", "42080.75", "12.5"],
]

# named string fields, oldest-first
BITSTAMP_OHLC: list[dict[str, str]] = [
    {
        "timestamp": "1704067200",
        "open": "42050.25",
        "high": "42100.0",
        "low": "42000.5",
        "close": "42080.75",
        "volume": "12.5",
    },
    {
        "timestamp": "1704068100",
        "open": "42085.5",
        "high": "42200.0",
        "low": "42080.0",
        "close": "42150.0",
        "volume": "8.25",
    },
]

# [ts_ms, open, close, high, low, volume] — oldest-first (sort=1)
BITFINEX_KLINES: list[list[str]] = [
    ["1704067200000", "42050.25", "42080.75", "42100.0", "42000.5", "12.5"],
    ["1704068100000", "42085.5", "42150.0", "42200.0", "42080.0", "8.25"],
]

# [ts_s, open, close, high, low, volume, turnover] — newest-first, strings
KUCOIN_KLINES: list[list[str]] = [
    ["1704068100", "42085.5", "42150.0", "42200.0", "42080.0", "8.25", "347206.9"],
    ["1704067200", "42050.25", "42080.75", "42100.0", "42000.5", "12.5", "525628.1"],
]

# 12-field kline, prices as strings, ms epochs — oldest-first
BINANCEUS_KLINES: list[list[str]] = [
    [
        "1704067200000", "42050.25", "42100.0", "42000.5", "42080.75", "12.5",
        "1704068099999", "525628.1", "150", "6.25", "262814.0", "0",
    ],
    [
        "1704068100000", "42085.5", "42200.0", "42080.0", "42150.0", "8.25",
        "1704068999999", "347206.9", "98", "4.1", "172600.2", "0",
    ],
]

RAW_FIXTURES = {
    "coinbase": COINBASE_KLINES,
    "bitstamp": BITSTAMP_OHLC,
    "bitfinex": BITFINEX_KLINES,
    "kucoin": KUCOIN_KLINES,
    "binanceus": BINANCEUS_KLINES,
}

FIXTURE_SYMBOL = "BTC-USDT"


def spark_array_values(klines: list[list[str]]) -> str:
    """VALUES body of array<string> rows for Spark SQL."""
    rows = ", ".join(
        "(array(" + ", ".join(f"'{v}'" for v in k) + f"), '{FIXTURE_SYMBOL}')"
        for k in klines
    )
    return rows


def duck_array_values(klines: list[list[str]]) -> str:
    """VALUES body of list rows for DuckDB (1-based indexing downstream)."""
    rows = ", ".join(
        "([" + ", ".join(f"'{v}'" for v in k) + f"], '{FIXTURE_SYMBOL}')"
        for k in klines
    )
    return rows
