"""Sequence packing for pretraining batches (X4) — a distributed
prefix sum (scan) in pure DataFrame form.

GPT-style training concatenates documents into one token stream per
stratum (usually per language) and cuts the stream every ``budget``
tokens; a document belongs to the context window where it STARTS.  The
whole operation is just an EXCLUSIVE PREFIX SUM of token counts over a
total order — but the naive formulation (one window over the entire
stratum) runs the stratum through a single task, which is exactly the
100 TB mistake: a language stratum is corpus-sized.

This module computes the prefix sum with the classic two-phase scan,
entirely JVM-side:

1. range-partition the rows by (strata, order) — partition i holds
   keys strictly below partition i+1, so partition id order IS key
   order (ties cannot straddle a boundary because the order key is a
   strict total order ending in a unique column);
2. a window over (partition_id, strata) — bounded by the partition
   size, never the stratum — produces the within-partition running
   sum;
3. the per-(partition, stratum) TOTALS (bounded by n_partitions x
   n_strata rows, the scan's carry table) are collected, prefix-summed
   driver-side in partition order, and broadcast back as offsets.

The result is bit-identical for ANY partition count (the prefix sum
over a fixed total order does not depend on where the range
partitioner cuts — pinned by the registry-wide partition sweep), which
is what makes a scan oracle-pairable.

Reference parity: no analog in crypto_collector.py (a collector has no
training-batch surface); this is LLM-pipeline extension territory
(SURVEY §2 X4), the batch-assembly step downstream of curation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def packed_positions(
    df: DataFrame,
    tokens_col: str,
    order_cols: Sequence[str],
    strata_cols: Sequence[str] = (),
) -> DataFrame:
    """Append ``start_pos`` — the exclusive prefix sum of ``tokens_col``
    over the (strata, order) total order, restarting at 0 per stratum.

    ``order_cols`` must end in a unique column (a strict total order);
    a tie straddling a range-partition boundary would otherwise make
    the partition-id ordering ambiguous.
    """
    keys = [*strata_cols, *order_cols]
    w = Window.partitionBy("_pid", *strata_cols).orderBy(*order_cols)
    # localCheckpoint before the carry-table collect: `d` feeds BOTH the
    # totals collect and the final join, and the _pid-keyed offsets are
    # only meaningful if both consumers see the IDENTICAL partitioning —
    # checkpointing runs the heavy shuffle+sort once and pins its result,
    # instead of recomputing it (and trusting the range partitioner to
    # reproduce the same bounds behind a possibly nondeterministic
    # upstream).  eager=False defers materialization to the collect.
    d = (
        df.repartitionByRange(*[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_run", F.sum(F.col(tokens_col).cast("long")).over(w))
        .localCheckpoint(eager=False)
    )
    # the scan's carry table: bounded by n_partitions x n_strata
    totals = (
        d.groupBy("_pid", *strata_cols)
        .agg(F.max("_run").alias("_total"))
        .collect()
    )
    offsets: dict[tuple, int] = {}
    acc: dict[tuple, int] = {}
    for r in sorted(totals, key=lambda r: (tuple(str(r[c]) for c in strata_cols), r["_pid"])):
        stratum = tuple(r[c] for c in strata_cols)
        offsets[(r["_pid"], stratum)] = acc.get(stratum, 0)
        acc[stratum] = acc.get(stratum, 0) + r["_total"]
    spark = df.sparkSession
    off_rows = [
        (pid, *stratum, off) for (pid, stratum), off in offsets.items()
    ]
    off_schema = ", ".join(
        ["_pid int"]
        + [f"{c} {dict(df.dtypes)[c]}" for c in strata_cols]
        + ["_offset long"]
    )
    off_df = spark.createDataFrame(off_rows, schema=off_schema)
    # null-safe equi-join: a NULL stratum value is its own partition
    # group in the window above, so the offset lookup must treat NULL
    # as equal to NULL too — a plain equi-join would silently drop
    # every NULL-strata row from the output.
    cond = d["_pid"] == off_df["_pid"]
    for c in strata_cols:
        cond = cond & d[c].eqNullSafe(off_df[c])
    joined = d.join(F.broadcast(off_df), cond).drop(off_df["_pid"])
    for c in strata_cols:
        joined = joined.drop(off_df[c])
    return (
        joined.withColumn(
            "start_pos",
            (
                F.col("_offset")
                + F.col("_run")
                - F.col(tokens_col).cast("long")
            ),
        )
        .drop("_pid", "_run", "_offset")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str,
    order_cols: Sequence[str],
    strata_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign each document the context-window ``bin_id`` where its
    token stream STARTS (streaming-concatenation packing): ``bin_id =
    start_pos DIV budget`` per stratum.  Exact integer math end to
    end, so two engines agree bit-for-bit."""
    if budget <= 0:
        raise ValueError(f"token budget must be positive, got {budget}")
    out = packed_positions(df, tokens_col, order_cols, strata_cols)
    return out.withColumn(
        "bin_id", F.expr(f"start_pos DIV {int(budget)}").cast("long")
    )
