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
) -> DataFrame:
    """Left as-of join: latest right row with ``right[on] <= left[on]``
    per ``by`` group.  Right payload columns come back suffixed; rows with
    no prior right row keep NULLs (LEFT semantics).
    """
    by = list(by)
    right_cols = list(right_cols or [c for c in right.columns if c not in (*by, on)])

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        *by,
        F.col(on),
        *[F.col(c) for c in right_cols],
    ).withColumn("_side", F.lit(0))

    # union with NULL-padded missing columns on each side
    l_cols = set(lhs.columns)
    packed = F.when(
        F.col("_side") == 0,
        F.struct(F.col(on).alias("_r_ts"), *[F.col(c).alias(c) for c in right_cols]),
    )
    rhs_packed = rhs.select(
        *by, F.col(on), F.lit(0).alias("_side"), packed.alias("_rpay")
    )
    lhs_packed = lhs.select(
        *lhs.columns, F.lit(None).cast(rhs_packed.schema["_rpay"].dataType).alias("_rpay")
    ).select(*by, F.col(on), F.col("_side"), F.col("_rpay"), *[
        c for c in left.columns if c not in (*by, on)
    ])
    unioned = rhs_packed.unionByName(lhs_packed, allowMissingColumns=True)

    # right rows sort before left rows at equal ts → '<=' tie semantics
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
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
