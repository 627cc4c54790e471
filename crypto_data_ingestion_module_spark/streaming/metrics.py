"""Operational telemetry (K3): the reference logs every stage through a
module logger (crypto_collector.py:24-29, 132, 558, 615-618, 696-698).
Spark-native equivalents: a ``StreamingQueryListener`` publishing
micro-batch progress, and a structured logger for batch pipelines.
"""

from __future__ import annotations

import json
import logging

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger("crypto_data_ingestion_module_spark")
if not logger.handlers:  # mirror the reference's basicConfig (24-29)
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def log_event(stage: str, **fields) -> None:
    """Structured pipeline telemetry (batch path)."""
    logger.info("%s %s", stage, json.dumps(fields, default=str, sort_keys=True))


class IngestProgressListener(StreamingQueryListener):
    """Publishes per-micro-batch progress: rows/sec, batch duration,
    watermark — the streaming analog of the reference's per-cycle logs
    (696-698)."""

    def onQueryStarted(self, event):  # noqa: N802
        log_event("stream_started", id=str(event.id), name=event.name)

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        log_event(
            "stream_progress",
            id=str(p.id),
            batchId=p.batchId,
            numInputRows=p.numInputRows,
            inputRowsPerSecond=p.inputRowsPerSecond,
            durationMs=dict(p.durationMs) if p.durationMs else {},
        )

    def onQueryTerminated(self, event):  # noqa: N802
        log_event("stream_terminated", id=str(event.id), exception=event.exception)

    def onQueryIdle(self, event):  # noqa: N802
        pass


def register_listener(spark: SparkSession) -> IngestProgressListener:
    listener = IngestProgressListener()
    spark.streams.addListener(listener)
    return listener
