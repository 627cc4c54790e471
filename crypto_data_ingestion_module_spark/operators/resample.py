"""OHLCV tumbling-window aggregation (A1).

The reference fetches candles pre-aggregated per interval (15m/1h/4h/6h/1d,
crypto_collector.py:479,774) rather than computing them; this operator owns
that aggregation natively so the engine can resample fine candles/ticks to
any coarser interval — batch or streaming.

Physical shape: one hash aggregate over ``(bucket, keys)`` with map-side
partial aggregation (min/max/sum combine; min_by/max_by carry (ts, value)
pairs).  No window functions, no sort — this is the plan that survives a
100× scale-up, because shuffle volume is ~one row per output candle.

Determinism: the open/close picks use ``min_by``/``max_by`` ordered by a
struct ``(ts, tiebreak)`` so duplicate timestamps cannot make the result
flap between runs (and the DuckDB oracle's arg_min/arg_max agrees).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.timeutil import bucket_start


def resample_ohlcv(
    df: DataFrame,
    interval_ms: int,
    keys: Sequence[str] = ("symbol", "exchange"),
    ts_col: str = "timestamp",
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    volume_col: str = "volume",
    tiebreak_col: str | None = None,
    exact_sums: bool = False,
) -> DataFrame:
    """Resample candles (or ticks: pass the price for all four OHLC cols)
    into ``interval_ms`` tumbling windows per ``keys``.

    ``exact_sums`` routes the volume sum through the micro-unit
    fixed-point policy — ``round(x·1e6)`` summed as DECIMAL(38,0), cast
    back to double (same as ``plans.queries.dsum``) — so the result is
    bit-identical across engines and aggregation orders (used by the
    correctness harness; the bench path keeps native double sums).
    A DECIMAL(38,10) *cast* would NOT work: Spark rounds the exact binary
    expansion while DuckDB multiplies in double, drifting ~1e-8.
    """
    ts = F.col(ts_col)
    order = F.struct(ts, F.col(tiebreak_col)) if tiebreak_col else ts
    bucket = bucket_start(ts, interval_ms).alias("bucket_ts")

    def _sum(c: Column) -> Column:
        if exact_sums:
            # Fixed-point micro-unit sum: bit-identical across engines and
            # aggregation orders (see plans.queries.dsum for the analysis),
            # accumulated on the split-long fast path (functions.exactsum).
            from crypto_data_ingestion_module_spark.functions.exactsum import (
                fsum,
            )

            return fsum(c, 1_000_000.0)
        return F.sum(c)

    aggs = [
        F.min_by(F.col(open_col), order).alias("open"),
        F.max(F.col(high_col)).alias("high"),
        F.min(F.col(low_col)).alias("low"),
        F.max_by(F.col(close_col), order).alias("close"),
        _sum(F.col(volume_col)).alias("volume"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(*aggs)
