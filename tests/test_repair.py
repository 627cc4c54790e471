"""Gap-repair planner: missing lake buckets → fetch manifest → fetch →
MERGE closes the gaps; the planner is a declarative fixpoint (empty when
the lake is complete)."""

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.pipelines import backfill
from crypto_data_ingestion_module_spark.sinks.snapshot import (
    read_snapshot,
    snapshot_delete,
    snapshot_upsert,
)
from crypto_data_ingestion_module_spark.sources.fetch import (
    MockExchangeAdapter,
    fetch_pages,
    normalize_mock_pages,
)
from crypto_data_ingestion_module_spark.sources.manifest import repair_manifest

DAY_MS = 86_400_000
START_MS = 1_704_067_200_000  # 2024-01-01 UTC


def test_repair_manifest_closes_gaps(spark, tmp_path):
    lake = str(tmp_path / "lake")
    symbols = spark.createDataFrame(
        [("BTC-USDT", START_MS)], "symbol string, start_ms long"
    )
    intervals = spark.createDataFrame(
        [("6h", 4)], "interval string, candles_per_day long"
    )
    backfill(
        spark,
        symbols,
        intervals,
        end_ms=START_MS + 3 * DAY_MS,
        adapter=MockExchangeAdapter(),
        lake_root=lake,
    )
    full = read_snapshot(spark, lake)
    n_full = full.count()
    states = {
        (r.symbol, r.interval, r.exchange, r.timestamp)
        for r in full.collect()
    }

    # complete lake: the planner finds NOTHING to repair
    assert repair_manifest(spark, full).count() == 0

    # punch a mid-series hole: day 2 of kucoin's series
    _, n_del = snapshot_delete(
        spark,
        lake,
        (F.col("exchange") == "kucoin")
        & (F.unix_micros("timestamp") / 1000 >= START_MS + DAY_MS)
        & (F.unix_micros("timestamp") / 1000 < START_MS + 2 * DAY_MS),
    )
    assert n_del == 4  # four 6h candles
    holey = read_snapshot(spark, lake)

    manifest = repair_manifest(spark, holey)
    tasks = manifest.collect()
    assert tasks, "planner missed the hole"
    # the hole is one contiguous run for one series
    assert {(t.symbol, t.interval, t.exchange) for t in tasks} == {
        ("BTC-USDT", "6h", "kucoin")
    }
    assert min(t.chunk_start_ms for t in tasks) == START_MS + DAY_MS
    assert max(t.chunk_end_ms for t in tasks) == START_MS + 2 * DAY_MS

    # fetch exactly the missing ranges and MERGE them back
    raw = fetch_pages(spark, manifest, MockExchangeAdapter())
    candles = normalize_mock_pages(raw).drop("_ingest_seq")
    snapshot_upsert(spark, candles, lake)

    repaired = read_snapshot(spark, lake)
    assert repaired.count() == n_full
    got = {
        (r.symbol, r.interval, r.exchange, r.timestamp)
        for r in repaired.collect()
    }
    assert got == states  # the exact original grid, nothing extra
    # fixpoint: nothing left to repair
    assert repair_manifest(spark, repaired).count() == 0
