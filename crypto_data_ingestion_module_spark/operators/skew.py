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

Measured regime (PERF_skew_r12.json, ~sf1 viral key = 30% of 8M
rows): for a Catalyst hash aggregate, ``salted_agg`` does NOT win —
the decomposition it requires is exactly the one Spark's map-side
partial aggregation already exploits, so the hot key collapses to one
row per map task BEFORE the shuffle (plain max-task 288 ms on the
same rows whose JOIN straggles at 1.8 s) and the salt only adds a
shuffle (2.0× wall).  Use it where partial aggregation is
unavailable — aggregation done OUTSIDE Catalyst (custom stateful
paths, foreachBatch sink-side combines) — or for join-fed skew use
``salted_join`` below, where the straggler is real.
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


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the bounded ``dims`` side over
    ``n_salts`` lanes instead of co-locating the hot key on one reducer.

    A co-located shuffle join partitions BOTH sides by ``keys`` — every
    row of a hot key lands on one task and the stage's wall-clock is
    that straggler.  Here each fact row takes a DETERMINISTIC salt from
    the hash of its non-key columns (no ``rand()`` — plans stay
    replayable), dim rows are exploded to all lanes, and the join key
    becomes ``(keys..., _salt)``: the hot key's fact rows spread over
    ``n_salts`` tasks while total shuffle volume grows only by
    ``n_salts`` × |dims| replicated rows (facts, the dominant term, are
    shuffled exactly once, same as before).  The result is
    bit-identical to the plain join — salting only re-buckets it.

    This is the generalized form of the CC loop's ``_salted_min_join``
    (operators/graph.py) and the same mitigation AQE's skew-join split
    applies at runtime; use this form when the skew is KNOWN (a viral
    key, a null-bucket) or when the join is a broadcast-ineligible
    build side below AQE's size thresholds.

    ``how`` must be ``inner`` or ``left`` (facts-preserving): for right
    or full joins, unmatched dim rows would surface once per lane.

    Degenerate-salt caveat: the salt hashes the fact row's NON-KEY
    columns (hashing the keys would give every hot-key row the same
    salt — one lane, no mitigation).  If ``facts`` has no non-key
    columns there is nothing row-varying to hash and the function
    falls back to hashing the keys, which by construction spreads
    nothing: it warns and behaves exactly like the plain join.  The
    same silent failure appears with LOW-CARDINALITY non-key columns
    (e.g. a boolean flag): all hot-key rows land on ≤ cardinality
    lanes.  Callers in that regime should add a spread column first
    (a monotonic id, an ingest sequence) — any column that varies per
    row restores the full ``n_salts`` fan-out.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(keys)
    non_key = [c for c in facts.columns if c not in keys]
    if not non_key:
        import warnings

        warnings.warn(
            "salted_join: facts has only key columns, so the salt is "
            "constant per key and the skew mitigation is a no-op; add a "
            "row-varying spread column (e.g. monotonically_increasing_id)",
            stacklevel=2,
        )
    salt_src = non_key if non_key else keys
    salted = facts.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)),
    )
    lanes = F.array(*[F.lit(i) for i in range(n_salts)])
    dims_x = dims.withColumn("_salt", F.explode(lanes))
    return salted.join(dims_x, [*keys, "_salt"], how).drop("_salt")
