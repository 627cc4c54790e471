"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (keep-last dedup + 1h OHLCV
resample over events — the reference's whole save-path semantics,
crypto_collector.py:523-558, as one DataFrame expression).

``queries()`` / ``oracle_sql()`` are generated from the registry in
``crypto_data_ingestion_module_spark.plans.queries`` — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import crypto_data_ingestion_module_spark.plans.queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = _q.queries()["ohlcv_resample_1h"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
