"""Skew-resistant aggregation: two-phase salted group-by.

At 100 TB a handful of hot keys (one exchange, one symbol) can pin a
whole stage on one reducer.  AQE's skew-join split covers joins; for
*aggregations* the classic fix is salting: spread each key over N
sub-keys, partially aggregate per (key, salt), then combine per key.
Both phases are hash aggregates with map-side combine, so the cost is
one extra (tiny) shuffle of N·|keys| pre-aggregated rows.

Only algebraic aggregates decompose this way — sum/count/min/max and
anything built from them (avg = sum/count).  The helper takes the
decomposition explicitly, keeping the operator honest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over possibly-skewed ``keys``.

    ``partial_aggs``: name → aggregate over the raw rows (phase 1, keyed
    by (keys, salt)).  ``final_aggs``: name → aggregate over the phase-1
    columns (keyed by keys).  Example::

        salted_agg(df, ["event_type"],
                   {"s": F.sum("value"), "n": F.count(F.lit(1))},
                   {"total": F.sum("s"), "rows": F.sum("n")})

    The salt hashes EVERY column of the row: deterministic across
    re-runs, and the spread degrades only if entire rows are duplicates.
    (Hashing a subset of payload columns looked cheaper but silently
    gave a near-constant salt for low-cardinality payloads — no skew
    mitigation while the caller believes it's active.)
    """
    keys = list(keys)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    ).alias("_salt")
    phase1 = df.groupBy(*keys, salt).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )
