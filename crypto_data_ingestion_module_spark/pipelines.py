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


def curate_and_shard(
    spark: SparkSession,
    docs: DataFrame,
    benchmark: DataFrame | None,
    work_dir: str,
    num_shards: int = 16,
    quality_min: float = 0.5,
    decontam_n: int = 4,
    mixture_caps: dict[str, int] | None = None,
    seed: int = 42,
) -> DataFrame:
    """The LLM-training-data pipeline end-to-end, one call:

    decontaminate (vs ``benchmark``) → quality gate → exact-dedup reps →
    near-dup cluster reps (SimHash Hamming pairs → connected components,
    materialized to ``{work_dir}/clusters``) → optional per-source
    mixture caps → seeded-shuffle shards at ``{work_dir}/shards``.

    Returns the shard manifest.  Every stage is the already-tested
    operator; this function is the composition a user actually runs, and
    each intermediate that a 100 TB run would materialize (cluster
    assignments, the shard files) IS materialized — nothing recomputes.
    """
    import os

    from crypto_data_ingestion_module_spark.operators.curation import (
        materialize_clusters,
        read_clusters,
    )
    from crypto_data_ingestion_module_spark.operators.decontam import (
        decontaminate,
    )
    from crypto_data_ingestion_module_spark.operators.sampling import (
        mixture_sample,
    )
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        simhash_hamming_pairs,
    )
    from crypto_data_ingestion_module_spark.sinks.shards import (
        write_training_shards,
    )
    from crypto_data_ingestion_module_spark.functions import text as TX

    clean = docs if benchmark is None else decontaminate(
        docs, benchmark, n=decontam_n
    )
    quality = clean.filter(TX.quality_score("text") >= quality_min)
    exact_reps = quality.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    survivors = quality.join(exact_reps.select("doc_id"), "doc_id", "semi")

    cluster_path = os.path.join(work_dir, "clusters")
    materialize_clusters(
        survivors, simhash_hamming_pairs(survivors), cluster_path
    )
    reps = read_clusters(spark, cluster_path).filter("is_rep").select("doc_id")
    curated = survivors.join(reps, "doc_id", "semi")

    if mixture_caps is not None:
        curated = mixture_sample(
            curated, "source", mixture_caps, id_col="doc_id", seed=seed
        ).drop("sample_rank")

    return write_training_shards(
        curated,
        os.path.join(work_dir, "shards"),
        num_shards=num_shards,
        id_col="doc_id",
        seed=seed,
    )


def backfill(
    spark: SparkSession,
    symbols_df: DataFrame,
    intervals_df: DataFrame,
    end_ms: int,
    adapter: Adapter,
    lake_root: str,
    pacing: dict[str, float] | None = None,
    normalizer=normalize_mock_pages,
    backend: str = "snapshot",
    incremental: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Historical backfill: manifest → distributed fetch → canonical
    candles → keep-last MERGE into the lake.

    Returns (progress, quarantine): the per-(symbol, interval, exchange)
    max collected timestamp (the reference's ``last_collected_ts`` state,
    500-512/652) and the failed-task side channel.

    ``backend="snapshot"`` (default) lands the merge as one
    snapshot-isolated commit (``sinks.snapshot``) — concurrent readers
    never see a half-applied backfill; ``"swap"`` keeps the plain
    directory layout for external parquet scanners.

    ``incremental=True`` (default): when the lake already exists, the
    manifest is clamped to its per-series watermarks
    (``sources.manifest.incremental_manifest``) — only uncollected
    buckets are fetched, and a re-run over an up-to-date lake fetches
    nothing, exactly the reference's ``last_collected_ts`` discipline
    (crypto_collector.py:481-520).  ``incremental=False`` re-fetches the
    full range (corrections sweep: keep-last MERGE makes it safe).

    ``normalizer`` must match the adapter's page layout: the mock layout
    for :class:`MockExchangeAdapter`, ``normalize_real_pages`` for real
    venue payloads — a mismatch scrambles OHLC column order silently.
    """
    manifest = backfill_manifest(spark, symbols_df, intervals_df, end_ms)
    if incremental:
        from crypto_data_ingestion_module_spark.sources.manifest import (
            incremental_manifest,
        )

        existing = None
        if backend == "snapshot":
            from crypto_data_ingestion_module_spark.sinks.snapshot import (
                current_version,
                read_snapshot,
            )

            if current_version(spark, lake_root) is not None:
                existing = read_snapshot(spark, lake_root)
        else:
            from crypto_data_ingestion_module_spark.sinks.parquet_lake import (
                _lake_exists,
                read_lake,
            )

            if _lake_exists(spark, lake_root):
                existing = read_lake(spark, lake_root)
        if existing is not None:
            manifest = incremental_manifest(manifest, existing)
    raw = fetch_pages(spark, manifest, adapter, pacing=pacing)
    # drop the chunk-provenance seq: the lake stamps a monotone
    # (max existing + 1) arrival order, so a re-fetch of the same range
    # strictly supersedes prior data and corrections always win
    candles = normalizer(raw).drop("_ingest_seq")
    if backend == "snapshot":
        from crypto_data_ingestion_module_spark.sinks.snapshot import (
            read_snapshot,
            snapshot_upsert,
        )

        snapshot_upsert(spark, candles, lake_root)
        lake = read_snapshot(spark, lake_root)
    else:
        upsert_lake(spark, candles, lake_root)

        from crypto_data_ingestion_module_spark.sinks.parquet_lake import (
            read_lake,
        )

        lake = read_lake(spark, lake_root)

    progress = (
        lake.groupBy("symbol", "interval", "exchange")
        .agg(
            F.max("timestamp").alias("last_collected_ts"),
            F.count(F.lit(1)).alias("n_candles"),
        )
    )
    return progress, quarantined(raw)
