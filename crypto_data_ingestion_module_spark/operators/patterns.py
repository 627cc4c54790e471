"""Time-series subsequence similarity search (X3 on the time axis).

Given a literal query pattern of ``k`` values, rank every length-``k``
sliding window of the per-type event stream by squared euclidean
distance and return the best matches — the distributed analogue of a
UCR-suite subsequence scan, and the time-series face of the engine's
similarity family (cosine top-k does it in embedding space; this does
it along the event stream itself — "find where the series looked like
THIS").

Plan shape: one ``row_number`` + one ``collect_list`` over the SAME
per-type window specification, so Catalyst plans a single sort+shuffle
per event-type partition (the window arrays never leave their
partition); the distance is a fixed-point expression over the collected
array against the broadcast-literal pattern, and the global top-k is a
TakeOrderedAndProject.  At 100 TB the stream would additionally be
bucketed by type/day so the window sort is partition-local — the same
layout the candle resamples already assume.

Determinism: values and the pattern are rounded to MILLI-units before
differencing; each squared diff is an integer-valued double ≤ 1e12 and
a window sums k of them, so every partial sum stays ≤ k·1e12 ≪ 2^53 —
exact in any accumulation order, in both engines (same policy family
as ``plans.queries.dsum``; milli not micro because the values are
squared).  Window order is total ((ts, event_id) tie-break), so the
collected arrays — and therefore the distances and the final (dist,
type, start) ranking — are bit-reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pattern_topk_windows(
    events: DataFrame,
    pattern: Sequence[float],
    k_out: int = 20,
    ts_col: str = "ts",
    type_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Top ``k_out`` length-``len(pattern)`` windows by squared distance.

    Returns ``(event_type, start_rn, dist)`` where ``start_rn`` is the
    1-based position of the window's first event within its type's
    (ts, id)-ordered stream, and ``dist`` is the squared euclidean
    distance at milli-unit precision.
    """
    k = len(pattern)
    w = Window.partitionBy(type_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    wf = w.rowsBetween(Window.currentRow, k - 1)
    pat = F.array(*[F.round(F.lit(float(p)) * 1000.0) for p in pattern])
    diff2 = F.zip_with(
        F.col("_arr"), pat, lambda x, p: (x - p) * (x - p)
    )
    dist = F.aggregate(diff2, F.lit(0.0), lambda a, b: a + b) / F.lit(1e6)
    return (
        events.select(
            F.col(type_col).alias("event_type"),
            F.row_number().over(w).cast("long").alias("start_rn"),
            F.collect_list(F.round(F.col(val_col) * 1000.0))
            .over(wf)
            .alias("_arr"),
        )
        .filter(F.size("_arr") == k)  # trailing stubs have no full window
        .select("event_type", "start_rn", dist.alias("dist"))
        .orderBy(F.asc("dist"), F.asc("event_type"), F.asc("start_rn"))
        .limit(k_out)
    )
