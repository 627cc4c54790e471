"""Z-order clustered layout + multi-column data skipping.

The snapshot lake (``sinks.snapshot``) prunes files by TIME only — the
right first axis for candle data, but a 100 TB lake is queried along more
than one dimension (symbol AND time, user AND value band).  A linear sort
clusters exactly one column; files are near-random along every other, so
per-file min/max stats prune nothing off-axis.  Z-ordering (bit-interleaved
space-filling curve — the Delta Lake / Iceberg ``OPTIMIZE ZORDER BY``
layout) clusters ALL listed columns at once: each file covers a small
hyper-rectangle of the key space, and any conjunctive range/equality
predicate over the z-columns skips most files through the same min/max
stats.

Everything is expression-level and distributed:

* ``zorder_key`` builds the interleaved key as a single JVM-side Column
  (shift/and/or inside whole-stage codegen — no UDF, no Python).
* Column bounds for bucketization come from ONE bounded aggregate job
  (2 doubles per column to the driver).
* The write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` —
  one range shuffle, one file per output task, which is exactly how a
  1000-executor OPTIMIZE job lays out a table.
* Per-file min/max stats for arbitrary columns are computed by one
  ``input_file_name``-grouped aggregate over the just-written files and
  stored in a ``_zstats.json`` sidecar; the reader intersects predicate
  boxes with file boxes driver-side (manifest arithmetic, no footer
  reads) before planning any scan.

``sinks.snapshot`` stays the versioned-commit layer; this module owns the
in-file ORDER and the off-axis skipping.  (The reference has neither: it
appends rows to a single day-file, crypto_collector.py:542-556.)
"""

from __future__ import annotations

import json
import math
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_STATS_NAME = "_zstats.json"


def _axis(df: DataFrame, col: str) -> Column:
    """Numeric/timestamp/date → double on a common monotone axis (epoch
    micros for temporals) for bucketization and stats."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    return c.cast("double")


def column_bounds(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple]:
    """Global [min, max] per z-column — one aggregate job, 2 scalars per
    column back to the driver (bounded by design at any table size)."""
    aggs = []
    for c in cols:
        a = _axis(df, c)
        aggs += [F.min(a).alias(f"_lo_{c}"), F.max(a).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bounds: Mapping[str, tuple] | None = None,
    bits: int | None = None,
) -> Column:
    """The interleaved z-value as one JVM Column expression.

    Each column is min-max bucketized to ``bits`` levels (default: as many
    as fit 63 bits across all columns, capped at 16), then bit ``i`` of
    column ``j`` lands at interleaved position ``i * n_cols + j``.  NULL
    axes sort first (bucket 0).
    """
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits is None:
        bits = min(16, 63 // k)
    if bounds is None:
        raise ValueError("pass bounds=column_bounds(df, cols)")
    levels = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = bounds[c]
        a = _axis(df, c)
        if lo is None or hi is None or hi <= lo:
            bucket = F.lit(0).cast("long")
        else:
            span = float(hi) - float(lo)
            bucket = F.least(
                F.greatest(
                    F.floor((a - float(lo)) / span * levels).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(levels).cast("long"),
            )
        bucket = F.coalesce(bucket, F.lit(0).cast("long"))
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def write_zordered(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    zcols: Sequence[str],
    n_files: int,
    stat_cols: Sequence[str] | None = None,
) -> dict:
    """Cluster ``df`` on the z-curve and write ``n_files`` parquet files
    plus a ``_zstats.json`` sidecar of per-file min/max stats.

    One range shuffle on the z-key (repartitionByRange samples the key
    distribution, so files are balanced even when the space is skewed),
    one local sort, one file per task.  Returns the stats mapping.
    """
    bounds = column_bounds(df, zcols)
    z = zorder_key(df, zcols, bounds=bounds)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    stats = compute_file_stats(
        spark, path, list(stat_cols) if stat_cols else list(zcols)
    )
    _write_sidecar(spark, path, {"zcols": list(zcols), "files": stats})
    return stats


def compute_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for ``cols`` — one grouped aggregate over the
    layout (runs where the data lives; only file-count × col-count scalars
    return to the driver)."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        a = _axis(df, c)
        aggs += [F.min(a).alias(f"_lo_{c}"), F.max(a).alias(f"_hi_{c}")]
    rows = (
        df.select(F.input_file_name().alias("_f"), *[F.col(c) for c in cols])
        .groupBy("_f")
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict[str, list]] = {}
    for r in rows:
        name = r["_f"].rsplit("/", 1)[-1]
        out[name] = {
            c: [r[f"_lo_{c}"], r[f"_hi_{c}"]] for c in cols
        }
    return out


def _write_sidecar(spark: SparkSession, path: str, payload: dict) -> None:
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = Path(f"{path.rstrip('/')}/._zstats.json.tmp")
    final = Path(f"{path.rstrip('/')}/{_STATS_NAME}")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(payload, default=str).encode("utf-8"))
    finally:
        out.close()
    if fs.exists(final):
        fs.delete(final, False)
    fs.rename(tmp, final)


def read_sidecar(spark: SparkSession, path: str) -> dict:
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    p = Path(f"{path.rstrip('/')}/{_STATS_NAME}")
    stream = fs.open(p)
    try:
        # py4j passes byte buffers by value, so a read(buf) loop can never
        # fill a Python-side array — route through commons-io instead.
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def files_matching(
    stats: Mapping[str, Mapping[str, list]],
    predicates: Mapping[str, tuple],
) -> list[str]:
    """Driver-side box intersection: keep files whose [min, max] interval
    overlaps the predicate interval on EVERY predicated column.  A file
    with no stats for a predicated column is conservatively kept."""
    keep = []
    for fname, cols in stats.items():
        ok = True
        for c, (lo, hi) in predicates.items():
            st = cols.get(c)
            if st is None or st[0] is None or st[1] is None:
                continue
            flo, fhi = float(st[0]), float(st[1])
            plo = -math.inf if lo is None else float(lo)
            phi = math.inf if hi is None else float(hi)
            if fhi < plo or flo > phi:
                ok = False
                break
        if ok:
            keep.append(fname)
    return sorted(keep)


def read_pruned(
    spark: SparkSession,
    path: str,
    predicates: Mapping[str, tuple],
) -> tuple[DataFrame, int, int]:
    """Stats-pruned read: returns (df, files_kept, files_total).

    The returned frame already carries the EXACT predicate as a filter, so
    results equal full-read + filter while the scan only plans the files
    whose stat boxes can match.  Predicate values are on the raw column
    axis (epoch micros for temporals, matching the sidecar).
    """
    # A missing sidecar (pre-zorder layout, or stats written by an older
    # job) degrades to a full scan with the exact filters — pruning is an
    # optimization and must never decide correctness.  Any OTHER failure
    # (corrupt JSON, FS error) propagates.
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(Path(f"{path.rstrip('/')}/{_STATS_NAME}")):
        df = spark.read.parquet(path)
        n = df.select(F.input_file_name()).distinct().count()
        for c, (lo, hi) in predicates.items():
            a = _axis(df, c)
            if lo is not None:
                df = df.filter(a >= float(lo))
            if hi is not None:
                df = df.filter(a <= float(hi))
        return df, n, n
    side = read_sidecar(spark, path)
    stats = side["files"]
    keep = files_matching(stats, predicates)
    total = len(stats)
    if not keep:
        df = spark.read.parquet(path).limit(0)
        return df, 0, total
    df = spark.read.parquet(*[f"{path.rstrip('/')}/{f}" for f in keep])
    for c, (lo, hi) in predicates.items():
        a = _axis(df, c)
        if lo is not None:
            df = df.filter(a >= float(lo))
        if hi is not None:
            df = df.filter(a <= float(hi))
    return df, len(keep), total
