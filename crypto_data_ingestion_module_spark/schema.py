"""Canonical schemas.

The reference never declares a schema — it is the shape of the dicts built
at normalize time (crypto_collector.py:123-131) that pandas later infers
(crypto_collector.py:529).  Here the schema is explicit: no inference, ever.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The single canonical candle record every exchange normalizes into
#: (reference: crypto_collector.py:123-131 and peers; FIXTURES.md §3).
CANDLE_SCHEMA = T.StructType(
    [
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("timestamp", T.TimestampType()),  # UTC interval start
        T.StructField("symbol", T.StringType()),  # canonical BASE-QUOTE
        T.StructField("exchange", T.StringType()),
    ]
)

#: Lake partition columns (reference path scheme crypto_collector.py:514-521).
LAKE_PARTITION_COLS = ("symbol", "interval", "data_type", "exchange", "date")

#: Raw fetch-task manifest row: one HTTP page fetch (SURVEY §2.8 T1).
FETCH_TASK_SCHEMA = T.StructType(
    [
        T.StructField("exchange", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("interval", T.StringType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
    ]
)

#: Canonical candle + ingest bookkeeping, as produced by the fetch layer.
INGEST_SCHEMA = T.StructType(
    CANDLE_SCHEMA.fields
    + [
        T.StructField("interval", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("_ingest_seq", T.LongType()),  # arrival order for keep-last
    ]
)

#: Multimodal document: opaque binary payload + typed metadata
#: (north-star extension; no reference citation by design).
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)
