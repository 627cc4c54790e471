"""Boundary-aligned trigger runner (T2): reproduce the reference's exact
wall-clock phase for live collection.

The reference sleeps to the next 15-minute boundary before every cycle
(``math.ceil(now/900)*900`` — crypto_collector.py:664-667, 712-717).
Spark's processing-time trigger is ALREADY epoch-aligned in steady state:
``ProcessingTimeExecutor.nextBatchTime(now) = now/interval*interval +
interval``, the same ceiling math.  The one unaligned firing is the FIRST
batch, which runs immediately at ``query.start()``.  This runner closes
that gap: sleep to the next exact boundary, then start the query — so
batch 1 lands on a boundary and every later batch inherits alignment from
the trigger executor.

Clock and sleep are injectable for tests; production callers use the
defaults.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

from crypto_data_ingestion_module_spark.functions.timeutil import (
    next_boundary_ms,
    sleep_to_boundary_s,
)


def _now_ms() -> int:
    return int(time.time() * 1000)


def start_boundary_aligned(
    start_query: Callable[[str], Any],
    interval_ms: int = 900_000,
    now_ms_fn: Callable[[], int] = _now_ms,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> tuple[Any, int]:
    """Sleep to the next exact ``interval_ms`` boundary, then start the
    streaming query phase-locked to it.

    ``start_query`` receives the processing-time trigger string (e.g.
    ``"900000 milliseconds"``) and must start and return the query::

        q, boundary = start_boundary_aligned(
            lambda trig: df.writeStream.trigger(processingTime=trig)
                           .foreachBatch(upsert).start(),
            interval_ms=900_000,
        )

    Returns ``(query, first_boundary_ms)`` — the boundary the first batch
    fired on; downstream gating (``should_collect_ms``) keys off it.
    """
    now = now_ms_fn()
    boundary = next_boundary_ms(now, interval_ms)
    sleep_fn(sleep_to_boundary_s(now, interval_ms))
    query = start_query(f"{interval_ms} milliseconds")
    return query, boundary
