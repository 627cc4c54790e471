"""End-to-end pipelines: the reference's two drive modes as single calls.

- :func:`backfill` = CryptoCollector.backfill_historical (626-657): plan a
  chunk manifest, fan the fetches across executors, normalize, MERGE into
  the lake, return the watermark/progress table.
- live collection lives in ``streaming.live`` (micro-batch loop, 659-717).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.sinks.parquet_lake import upsert_lake
from crypto_data_ingestion_module_spark.sources.fetch import (
    Adapter,
    fetch_pages,
    normalize_mock_pages,
    quarantined,
)
from crypto_data_ingestion_module_spark.sources.manifest import backfill_manifest


def backfill(
    spark: SparkSession,
    symbols_df: DataFrame,
    intervals_df: DataFrame,
    end_ms: int,
    adapter: Adapter,
    lake_root: str,
    pacing: dict[str, float] | None = None,
    normalizer=normalize_mock_pages,
) -> tuple[DataFrame, DataFrame]:
    """Historical backfill: manifest → distributed fetch → canonical
    candles → keep-last MERGE into the lake.

    Returns (progress, quarantine): the per-(symbol, interval, exchange)
    max collected timestamp (the reference's ``last_collected_ts`` state,
    500-512/652) and the failed-task side channel.

    ``normalizer`` must match the adapter's page layout: the mock layout
    for :class:`MockExchangeAdapter`, ``normalize_real_pages`` for real
    venue payloads — a mismatch scrambles OHLC column order silently.
    """
    manifest = backfill_manifest(spark, symbols_df, intervals_df, end_ms)
    raw = fetch_pages(spark, manifest, adapter, pacing=pacing)
    # drop the chunk-provenance seq: the lake stamps a monotone
    # (max existing + 1) arrival order, so a re-fetch of the same range
    # strictly supersedes prior data and corrections always win
    candles = normalizer(raw).drop("_ingest_seq")
    upsert_lake(spark, candles, lake_root)

    from crypto_data_ingestion_module_spark.sinks.parquet_lake import read_lake

    progress = (
        read_lake(spark, lake_root)
        .groupBy("symbol", "interval", "exchange")
        .agg(
            F.max("timestamp").alias("last_collected_ts"),
            F.count(F.lit(1)).alias("n_candles"),
        )
    )
    return progress, quarantined(raw)
