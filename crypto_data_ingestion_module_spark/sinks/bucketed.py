"""Bucketed table sink: co-located joins without a shuffle.

At 100 TB the dominant cost of the engine's fact⨝fact joins (cross-stream
compare on (symbol, interval, timestamp); orders⨝lineitem in the
relational suite; candle history self-joins) is the shuffle of both sides
onto the join key.  Writing the tables bucketed on that key moves the
shuffle to WRITE time, once, instead of every query: Spark records the
bucket spec in the catalog, and a join of two tables bucketed on the same
key with the same bucket count scans co-located buckets and sort-merge
joins them with NO Exchange on either side (proven by the plan-shape
test).

Bucketing requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` cannot carry the bucket spec.  ``path`` pins data
location, so the catalog entry is metadata-only and the files stay where
the lake wants them.

Reference parity: the reference has no join surface at all (SURVEY.md
§2.5) — this is a capability extension for the scale path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table.

    ``sort_cols`` (defaulting to the bucket key) sorts within each bucket
    file, so downstream sort-merge joins skip their sort as well, and
    range predicates on the sort key get parquet row-group pruning.
    """
    sort_cols = list(sort_cols) if sort_cols else list(bucket_cols)
    w = (
        df.write.format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .mode(mode)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog scan — carries the bucket spec, unlike ``read.parquet``."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    With both tables bucketed on ``on`` with equal bucket counts, the
    physical plan is a zero-Exchange sort-merge join; otherwise Spark
    silently falls back to shuffling — ``assert_no_shuffle_join`` guards
    against that regression in tests.
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), list(on), how
    )


def physical_plan(df: DataFrame) -> str:
    """Formatted physical plan string (for plan-shape assertions)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the plan shuffles — the co-located-join contract."""
    plan = physical_plan(df)
    if "Exchange" in plan:
        raise AssertionError(
            f"bucketed join plan contains a shuffle Exchange:\n{plan}"
        )
