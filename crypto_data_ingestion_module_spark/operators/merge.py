"""Union + keep-last merge (D3 + D1 + D2) — the reference's per-file
read → concat → sort → drop_duplicates(keep='last') pipeline
(crypto_collector.py:542-553) as one DataFrame expression.

``existing`` rows get ingest sequence 0, ``incoming`` rows 1 (+ their own
intra-batch order if provided), so re-delivered keys resolve to the newest
arrival — MERGE-style keep-last upsert, not blind append.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.dedup import dedup_keep_last

INGEST_SEQ = "_ingest_seq"


def merge_keep_last(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Merge ``incoming`` over ``existing``; newest arrival wins per key.

    Either side may already carry an ``_ingest_seq`` column (monotone
    arrival order); if absent one is synthesized (existing=0, incoming=1).
    The result keeps ``_ingest_seq`` so successive merges stay ordered.
    """
    if existing is None:
        if INGEST_SEQ not in incoming.columns:
            incoming = incoming.withColumn(INGEST_SEQ, F.lit(1).cast("long"))
        return dedup_keep_last(incoming, keys, INGEST_SEQ)

    if INGEST_SEQ not in existing.columns:
        existing = existing.withColumn(INGEST_SEQ, F.lit(0).cast("long"))
    if INGEST_SEQ not in incoming.columns:
        # stamp STRICTLY ABOVE the existing maximum — a constant (e.g. 1)
        # would tie with survivors of a previous merge and let the stale
        # payload win the deterministic tie-break, silently dropping
        # corrections.  Lazy: one agg + broadcast join, no driver action.
        mx = existing.agg(
            F.coalesce(F.max(INGEST_SEQ), F.lit(0)).alias("_max_seq")
        )
        incoming = incoming.crossJoin(F.broadcast(mx)).withColumn(
            INGEST_SEQ, (F.col("_max_seq") + 1).cast("long")
        ).drop("_max_seq")
    combined = existing.unionByName(incoming, allowMissingColumns=True)
    return dedup_keep_last(combined, keys, INGEST_SEQ)
