"""Adversarial-input robustness: venue parsers and text functions.

The engine's failure contract is (a) parsers either return well-typed
rows or raise — and the fetch kernel turns any raise into a quarantine
row, never a failed task; (b) text Column functions total-function over
arbitrary strings (empty, unicode, control chars) without raising and
with their documented ranges intact.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.sources.http import parse_response

_EXCHANGES = ["coinbase", "bitstamp", "bitfinex", "kucoin", "binanceus"]

_jsonish = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**40), max_value=2**40),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=12),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)


@settings(deadline=None, max_examples=200)
@given(
    exchange=st.sampled_from(_EXCHANGES),
    status=st.integers(min_value=100, max_value=599),
    body=_jsonish,
)
def test_parse_response_returns_typed_rows_or_raises(exchange, status, body):
    """Whatever the wire sends, the parser never hands malformed data
    downstream: any non-exception result is a list of lists of str (and
    json-serializable, like the recorded fixtures)."""
    try:
        rows = parse_response(exchange, status, body)
    except Exception:
        return  # the fetch kernel quarantines this — contract satisfied
    assert isinstance(rows, list)
    for row in rows:
        assert isinstance(row, list)
        assert all(isinstance(v, str) for v in row)
    json.dumps(rows)


def test_garbage_body_quarantines_not_fails(spark):
    """A venue returning 200 with a garbage body must become quarantine
    rows through the real fetch kernel, not a failed job."""
    from crypto_data_ingestion_module_spark.sources.fetch import (
        fetch_pages,
        quarantined,
    )
    from crypto_data_ingestion_module_spark.sources.http import VenueHttpAdapter
    from crypto_data_ingestion_module_spark.sources.manifest import (
        backfill_manifest,
    )

    symbols = spark.createDataFrame(
        [("BTC-USDT", 1704067200000)], "symbol string, start_ms long"
    )
    intervals = spark.createDataFrame(
        [("1d", 1)], "interval string, candles_per_day long"
    )
    manifest = backfill_manifest(
        spark, symbols, intervals, 1704067200000 + 2 * 86_400_000
    )
    adapter = VenueHttpAdapter(lambda url, params: (200, {"oops": [1, 2]}))
    raw = fetch_pages(spark, manifest, adapter)
    q = quarantined(raw)
    assert q.count() == manifest.count()  # every chunk quarantined
    assert raw.filter(F.col("error").isNull()).count() == 0  # zero "klines"


_ADVERSARIAL = [
    "",
    " ",
    "\t\n\r",
    "a",
    "ä ö ü ß",
    "日本語のテキストです。中文文本。",
    "🙂🚀🔥" * 5,
    "\x00\x01\x02",
    "word " * 2000,
    "ALLCAPS SHOUTING!!!",
    "mixed 数字 123 and ünïcödé",
    "a.b.c.d.e.f",
    "........",
    "https://example.com/path?q=1&r=2",
    "tab\tseparated\tfields",
]


def test_text_functions_total_on_adversarial_strings(spark):
    from crypto_data_ingestion_module_spark.functions import text as TX

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_ADVERSARIAL)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        TX.word_count("text").alias("wc"),
        TX.token_count("text").alias("tc"),
        TX.quality_score("text").alias("q"),
        TX.fingerprint("text").alias("fp"),
        TX.punct_count("text").alias("pc"),
        TX.stopword_count("text").alias("sw"),
    ).collect()
    assert len(out) == len(_ADVERSARIAL)
    for r in out:
        assert r.wc >= 0 and r.tc >= 0 and r.pc >= 0 and r.sw >= 0
        assert 0.0 <= r.q <= 1.0, (r.doc_id, r.q)
        assert len(r.fp) == 32  # md5 hex


def test_curation_ops_total_on_adversarial_strings(spark):
    """Dedup/decontam operators must process the adversarial corpus
    end-to-end (no raise, full coverage)."""
    from crypto_data_ingestion_module_spark.operators.decontam import (
        contamination_flags,
    )
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        minhash_lsh_pairs,
        simhash_hamming_pairs,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(_ADVERSARIAL)], "doc_id long, text string"
    )
    flags = contamination_flags(df, df.limit(3), n=4)
    assert flags.count() == len(_ADVERSARIAL)
    # pair generators run without raising; pair ids stay in-corpus
    ids = set(range(len(_ADVERSARIAL)))
    for pairs in (minhash_lsh_pairs(df), simhash_hamming_pairs(df)):
        for r in pairs.collect():
            assert r.id_a in ids and r.id_b in ids and r.id_a < r.id_b
