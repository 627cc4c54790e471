"""Mergeable frequent-items sketch (Misra-Gries) over a column.

The heavy-hitters companion to the quantile sketch
(``value_quantiles_sketch``): at 100 TB nobody groupBys a
billion-distinct column to find the hot keys — a bounded-memory sketch
per partition plus one bounded merge does it with a hard guarantee.

Shape: one ``mapInPandas`` pass runs Misra-Gries with ``k`` counters
over each partition (Arrow-batched; state is k counters regardless of
partition size), emitting at most k ``(item, count_lower)`` rows per
partition.  The merge is a plain hash aggregate over those
partitions x k rows (MG partials UNDER-count: summing lower bounds
keeps a lower bound), followed by one bounded trim.

Guarantee (pinned in tests): per-partition MG under-counts any item by
at most n_p/(k+1); summed over partitions the total deficit is at most
n/(k+1).  Every item with true frequency > n/(k+1) therefore survives
with a positive summed count, and reporting the top results by summed
lower bound can only miss items whose true count is within n/(k+1) of
the threshold.  Exact counts for the survivors, when needed, are one
semi-join back to the fact (bounded candidate list) — the standard
two-pass heavy-hitter recipe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(col: str, k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col].dropna():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros (dict rebuild is
                    # amortized: happens at most n/k times per partition)
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame(
            {
                "item": list(counters.keys()),
                "count_lower": list(counters.values()),
            }
        )

    return run


def frequent_items(
    df: DataFrame, col: str, k: int = 64, top: int = 20
) -> DataFrame:
    """Approximate top-``top`` heavy hitters of ``col`` with k-counter
    Misra-Gries partials merged by one hash aggregate.  Returns
    ``(item, count_lower)`` ordered by the summed lower bound (ties by
    item) — a LOWER bound on each survivor's true count."""
    src = df.select(F.col(col).cast("string").alias(col))
    partials = src.mapInPandas(
        _mg_partition(col, k), schema="item string, count_lower long"
    )
    return (
        partials.groupBy("item")
        .agg(F.sum("count_lower").alias("count_lower"))
        .orderBy(F.desc("count_lower"), F.asc("item"))
        .limit(top)
    )
