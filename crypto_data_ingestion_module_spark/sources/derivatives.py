"""Derivatives / options scans (S8): declared-but-unimplemented surface.

The reference stubs every derivatives/options fetch to return ``[]`` /
``None`` (crypto_collector.py:140-146, 222-224, 299-301, 380-382,
468-474, 590-598) while still concatenating the (empty) results into the
save path (622).  The Spark analog: *typed* empty sources — schema-stable
DataFrames that union cleanly with real spot data, so the day derivatives
go live nothing downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from crypto_data_ingestion_module_spark.schema import CANDLE_SCHEMA

#: Futures/perp candles share the candle shape + open interest & funding.
DERIVATIVES_SCHEMA = T.StructType(
    CANDLE_SCHEMA.fields
    + [
        T.StructField("open_interest", T.DoubleType()),
        T.StructField("funding_rate", T.DoubleType()),
    ]
)

#: Options chains: strike/expiry/type + greeks placeholder.
OPTIONS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("expiry", T.TimestampType()),
        T.StructField("strike", T.DoubleType()),
        T.StructField("option_type", T.StringType()),  # call|put
        T.StructField("mark_price", T.DoubleType()),
        T.StructField("implied_vol", T.DoubleType()),
        T.StructField("open_interest", T.DoubleType()),
    ]
)


def derivatives_scan(spark: SparkSession) -> DataFrame:
    """Empty typed derivatives source (reference returns [] — 590-594)."""
    return spark.createDataFrame([], DERIVATIVES_SCHEMA)


def options_scan(spark: SparkSession) -> DataFrame:
    """Empty typed options source (reference returns None — 595-598)."""
    return spark.createDataFrame([], OPTIONS_SCHEMA)
