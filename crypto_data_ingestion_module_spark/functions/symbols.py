"""Per-venue symbol dialect mappings (P8).

Reference behavior (crypto_collector.py):
- Coinbase 103-111:  ``BTC-USDT`` → ``BTC-USD``   (USDT quote becomes USD)
- Bitstamp 176-184:  ``BTC-USDT`` → ``btcusd``    (lowercase, concat, USDT→USD)
- Bitfinex 252-261:  ``BTC-USDT`` → ``tBTCUSD``   ('t' prefix, concat, USDT→USD)
- Kucoin   (none):   canonical ``BASE-QUOTE`` used as-is
- Binance.US 426:    ``BTC-USDT`` → ``BTCUSDT``   (drop the dash)

Pure string Column expressions (split / when / concat / lower) — these stay
in whole-stage codegen and are trivially SQL-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(symbol: Column | str) -> Column:
    return F.col(symbol) if isinstance(symbol, str) else symbol


def _base(symbol: Column) -> Column:
    return F.split(symbol, "-").getItem(0)


def _quote_usd(symbol: Column) -> Column:
    """Quote part with the USDT→USD collapse applied."""
    quote = F.split(symbol, "-").getItem(1)
    return F.when(quote == "USDT", F.lit("USD")).otherwise(quote)


def to_coinbase(symbol: Column | str) -> Column:
    """``BTC-USDT`` → ``BTC-USD`` (reference 103-111)."""
    c = _col(symbol)
    mapped = F.concat_ws("-", _base(c), _quote_usd(c))
    # Non BASE-QUOTE shapes fall back to a plain USDT→USD replace (110-111).
    return F.when(F.size(F.split(c, "-")) == 2, mapped).otherwise(
        F.replace(c, F.lit("USDT"), F.lit("USD"))
    )


def to_bitstamp(symbol: Column | str) -> Column:
    """``BTC-USDT`` → ``btcusd`` (reference 176-184)."""
    c = _col(symbol)
    mapped = F.lower(F.concat(_base(c), _quote_usd(c)))
    return F.when(F.size(F.split(c, "-")) == 2, mapped).otherwise(
        F.replace(F.lower(c), F.lit("usdt"), F.lit("usd"))
    )


def to_bitfinex(symbol: Column | str) -> Column:
    """``BTC-USDT`` → ``tBTCUSD`` (reference 252-261)."""
    c = _col(symbol)
    mapped = F.concat(F.lit("t"), _base(c), _quote_usd(c))
    return F.when(F.size(F.split(c, "-")) == 2, mapped).otherwise(
        F.replace(F.concat(F.lit("t"), F.replace(c, F.lit("-"), F.lit(""))), F.lit("USDT"), F.lit("USD"))
    )


def to_kucoin(symbol: Column | str) -> Column:
    """Kucoin consumes the canonical ``BASE-QUOTE`` form unchanged."""
    return _col(symbol)


def to_binanceus(symbol: Column | str) -> Column:
    """``BTC-USDT`` → ``BTCUSDT`` (reference 426)."""
    return F.replace(_col(symbol), F.lit("-"), F.lit(""))
