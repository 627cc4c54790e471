"""As-of join: for each left row, the latest right row with
``right.ts <= left.ts`` within the same key group (SURVEY §2.5 capability
extension — aligning mismatched candle grids / last-known-price lookup).

Spark has no native as-of join; a naive range join is O(n·m) per key.
This is the **union trick**: tag both sides, union, sort within
(key, ts)-partitions, and carry the last seen right payload forward with
``last(ignorenulls=True)`` over a running window.  Physically: ONE
shuffle by key + a within-partition sort — the same cost as a regular
sort-merge join, and it scales to arbitrarily dense right sides (the
window never materializes a cross product).

Tie rule: a right row at exactly left.ts matches (``<=``), implemented by
sorting right rows *before* left rows at equal ts (side tag ordering).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: Sequence[str] = ("symbol",),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with ``right[on] <= left[on]``
    per ``by`` group.  Right payload columns come back suffixed; rows with
    no prior right row keep NULLs (LEFT semantics).

    **Right-side uniqueness**: if the right side has duplicate
    ``(by, on)`` keys the picked row is whichever sorts last in the
    shuffle — nondeterministic run-to-run.  Either pre-dedup the right
    side (``dedup_keep_last``, what plans.queries does) or pass
    ``right_tiebreak``: a right column appended to the window ordering so
    the *greatest* tiebreak value wins deterministically at equal ts.
    """
    by = list(by)
    right_cols = list(right_cols or [c for c in right.columns if c not in (*by, on)])

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        *by,
        F.col(on),
        *[F.col(c) for c in right_cols],
        *(
            [F.col(right_tiebreak)]
            if right_tiebreak and right_tiebreak not in (*by, on, *right_cols)
            else []
        ),
    ).withColumn("_side", F.lit(0))

    # union with NULL-padded missing columns on each side
    l_cols = set(lhs.columns)
    packed = F.when(
        F.col("_side") == 0,
        F.struct(F.col(on).alias("_r_ts"), *[F.col(c).alias(c) for c in right_cols]),
    )
    rhs_packed = rhs.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        packed.alias("_rpay"),
        *(
            [F.col(right_tiebreak).alias("_tb")]
            if right_tiebreak
            else []
        ),
    )
    lhs_packed = lhs.select(
        *lhs.columns, F.lit(None).cast(rhs_packed.schema["_rpay"].dataType).alias("_rpay")
    ).select(*by, F.col(on), F.col("_side"), F.col("_rpay"), *[
        c for c in left.columns if c not in (*by, on)
    ])
    unioned = rhs_packed.unionByName(lhs_packed, allowMissingColumns=True)

    # right rows sort before left rows at equal ts → '<=' tie semantics;
    # optional _tb makes the greatest-tiebreak right row the one carried
    # when right has duplicate (by, on) keys (left rows union in with a
    # NULL _tb via allowMissingColumns, ordered first so _side still wins)
    order_cols = [F.col(on).asc(), F.col("_side").asc()]
    if right_tiebreak:
        order_cols.append(F.col("_tb").asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_rlast", F.last("_rpay", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        *by,
        F.col(on),
        *[c for c in left.columns if c not in (*by, on)],
        F.col("_rlast._r_ts").alias(f"{on}{suffix}"),
        *[F.col(f"_rlast.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
