"""Recorded-fixture HTTP adapters (S1-S5 live seam): exact wire surface
per venue + normalize parity with the fixture/mock path.

Each venue's test pins the full URL and params the reference would send
(crypto_collector.py: Coinbase 92-113, Bitstamp 186-197, Bitfinex
263-274, Kucoin 331-348, Binance.US 428-439) — no network; the
injectable transport replays the canned payloads from
``sources.fixtures``.
"""

import datetime as dt

import pytest

from crypto_data_ingestion_module_spark.sources import fixtures as fx
from crypto_data_ingestion_module_spark.sources.fetch import (
    HttpExchangeAdapter,
    fetch_pages,
    normalize_real_pages,
    quarantined,
)
from crypto_data_ingestion_module_spark.sources.http import (
    RecordedTransport,
    VenueHttpAdapter,
    build_request,
    parse_response,
)

START_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
END_MS = 1_704_069_000_000  # 2024-01-01T00:30:00Z


def test_coinbase_request_granularity_seconds_iso_bounds():
    req = build_request("coinbase", "BTC-USDT", "900", START_MS, END_MS, 300)
    assert req.url == "https://api.exchange.coinbase.com/products/BTC-USD/candles"
    assert req.params == {
        "granularity": 900,  # SECONDS, not the interval string
        "limit": 300,
        "start": "2024-01-01T00:00:00+00:00",  # ISO-8601, not epoch
        "end": "2024-01-01T00:30:00+00:00",
    }


def test_bitstamp_request_step_seconds_epoch_s():
    req = build_request("bitstamp", "BTC-USDT", "900", START_MS, END_MS, 300)
    assert req.url == "https://www.bitstamp.net/api/v2/ohlc/btcusd/"
    assert req.params == {
        "step": 900,
        "limit": 300,
        "start": 1_704_067_200,  # epoch-SECONDS
        "end": 1_704_069_000,
    }


def test_bitfinex_request_sort1_epoch_ms_timeframe_in_path():
    req = build_request("bitfinex", "BTC-USDT", "1D", START_MS, END_MS, 500)
    assert req.url == (
        "https://api-pub.bitfinex.com/v2/candles/trade:1D:tBTCUSD/hist"
    )
    assert req.params == {
        "limit": 300,  # venue cap applied to the oversized ask
        "sort": 1,  # chronological order
        "start": START_MS,  # epoch-MS
        "end": END_MS,
    }


def test_kucoin_request_epoch_s_and_error_envelope():
    req = build_request("kucoin", "BTC-USDT", "15min", START_MS, END_MS, 300)
    assert req.url == "https://api.kucoin.com/api/v1/market/candles"
    assert req.params == {
        "symbol": "BTC-USDT",  # canonical form unchanged
        "type": "15min",
        "startAt": 1_704_067_200,  # epoch-SECONDS
        "endAt": 1_704_069_000,
    }
    # body-level envelope: HTTP 200 but code != "200000" is an error
    with pytest.raises(RuntimeError, match="kucoin API error: rate limited"):
        parse_response("kucoin", 200, {"code": "429000", "msg": "rate limited"})
    # both bounds are required (reference 334-341)
    with pytest.raises(ValueError, match="both start_ms and end_ms"):
        build_request("kucoin", "BTC-USDT", "15min", None, END_MS, 300)


def test_binanceus_request_epoch_ms_concat_symbol():
    req = build_request("binanceus", "BTC-USDT", "15m", START_MS, END_MS, 300)
    assert req.url == "https://api.binance.us/api/v3/klines"
    assert req.params == {
        "symbol": "BTCUSDT",  # dash dropped, USDT kept
        "interval": "15m",
        "limit": 300,
        "startTime": START_MS,  # epoch-MS
        "endTime": END_MS,
    }


def _recorded_transport() -> RecordedTransport:
    return RecordedTransport(
        {
            "https://api.exchange.coinbase.com/products/BTC-USD/candles": (
                200,
                fx.COINBASE_KLINES,
            ),
            "https://www.bitstamp.net/api/v2/ohlc/btcusd/": (
                200,
                {"data": {"pair": "BTC/USD", "ohlc": fx.BITSTAMP_OHLC}},
            ),
            "https://api-pub.bitfinex.com/v2/candles/trade:15m:tBTCUSD/hist": (
                200,
                fx.BITFINEX_KLINES,
            ),
            "https://api.kucoin.com/api/v1/market/candles": (
                200,
                {"code": "200000", "data": fx.KUCOIN_KLINES},
            ),
            "https://api.binance.us/api/v3/klines": (200, fx.BINANCEUS_KLINES),
        }
    )


def test_http_status_error_raises():
    adapter = VenueHttpAdapter(RecordedTransport({}))  # every URL → 404
    with pytest.raises(RuntimeError, match="coinbase API error 404"):
        adapter("coinbase", "BTC-USDT", "900", START_MS, END_MS, 300)


VENUE_NATIVE = {
    "coinbase": "900",
    "bitstamp": "900",
    "bitfinex": "15m",
    "kucoin": "15min",
    "binanceus": "15m",
}


def test_http_fetch_normalize_parity_all_venues(spark):
    """End-to-end: recorded transport → fetch kernel → dialect
    normalizers.  Every venue's payload encodes the SAME two logical
    candles; the canonical output must agree across all five dialects
    (and with the fixture-direct path the oracle query uses)."""
    transport = _recorded_transport()
    adapter = HttpExchangeAdapter(transport=transport)
    manifest = spark.createDataFrame(
        [
            ("BTC-USDT", "15m", ex, native, 300, START_MS, END_MS)
            for ex, native in VENUE_NATIVE.items()
        ],
        "symbol string, interval string, exchange string, "
        "native_interval string, page_limit int, "
        "chunk_start_ms long, chunk_end_ms long",
    )
    raw = fetch_pages(spark, manifest, adapter)
    out = normalize_real_pages(raw)
    assert quarantined(raw).count() == 0

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 15)
    expect = {
        t0: (42050.25, 42100.0, 42000.5, 42080.75, 12.5),
        t1: (42085.5, 42200.0, 42080.0, 42150.0, 8.25),
    }
    rows = out.collect()
    assert len(rows) == 2 * len(VENUE_NATIVE)
    for r in rows:
        assert (r.open, r.high, r.low, r.close, r.volume) == expect[r.timestamp], (
            r.exchange,
            r.timestamp,
        )
        assert r.symbol == "BTC-USDT" and r.data_type == "spot"

    # wire surface: the adapter resolves exactly the pinned URL per venue
    # (asserted driver-side — the executor copies of the transport record
    # into their own processes, not this one)
    probe = RecordedTransport(_recorded_transport().payloads)
    driver_adapter = VenueHttpAdapter(probe)
    for ex, native in VENUE_NATIVE.items():
        driver_adapter(ex, "BTC-USDT", native, START_MS, END_MS, 300)
    assert sorted(r.url for r in probe.requests) == sorted(probe.payloads)


def test_kucoin_error_envelope_quarantines_not_fails(spark):
    """A venue-level error (Kucoin code != 200000) must land in the
    quarantine side-channel (T7), never fail the Spark task."""
    transport = RecordedTransport(
        {
            "https://api.kucoin.com/api/v1/market/candles": (
                200,
                {"code": "500000", "msg": "down for maintenance"},
            )
        }
    )
    manifest = spark.createDataFrame(
        [("BTC-USDT", "15m", "kucoin", "15min", 300, START_MS, END_MS)],
        "symbol string, interval string, exchange string, "
        "native_interval string, page_limit int, "
        "chunk_start_ms long, chunk_end_ms long",
    )
    raw = fetch_pages(spark, manifest, HttpExchangeAdapter(transport=transport))
    bad = quarantined(raw).collect()
    assert len(bad) == 1
    assert "down for maintenance" in bad[0].error
    assert normalize_real_pages(raw).count() == 0


def test_python_symbol_dialects_match_column_expressions(spark):
    """The adapter's plain-Python symbol mappers must agree with the
    Column-expression dialects (functions/symbols.py) used by the
    oracle-paired symbol_dialects query."""
    from pyspark.sql import functions as F

    from crypto_data_ingestion_module_spark.functions import symbols as S
    from crypto_data_ingestion_module_spark.sources import http as H

    cases = ["BTC-USDT", "ETH-USD", "SOL-EUR", "DOGEUSDT", "ABC-DEF-GHI"]
    df = spark.createDataFrame([(s,) for s in cases], "symbol string").select(
        "symbol",
        S.to_coinbase("symbol").alias("cb"),
        S.to_bitstamp("symbol").alias("bs"),
        S.to_bitfinex("symbol").alias("bf"),
        S.to_binanceus("symbol").alias("bn"),
    )
    for r in df.collect():
        assert H.coinbase_symbol(r.symbol) == r.cb, r.symbol
        assert H.bitstamp_symbol(r.symbol) == r.bs, r.symbol
        assert H.bitfinex_symbol(r.symbol) == r.bf, r.symbol
        assert H.binanceus_symbol(r.symbol) == r.bn, r.symbol
