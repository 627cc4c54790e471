"""Partitioned Parquet lake sink (K1) + keep-last upsert (K2).

Reference semantics (crypto_collector.py):
- path scheme ``{DATA_DIR}/crypto/{symbol}/{interval}/{data_type}/{exchange}/
  {date}_{interval}_{symbol}.parquet`` (514-521) → Hive-style
  ``partitionBy(symbol, interval, data_type, exchange, date)``; partition
  pruning then gives the same one-file-per-day read locality for free.
- upsert (542-556): if the day-file exists, read → concat → sort →
  drop_duplicates(keep='last') → overwrite.  Here: read only the touched
  partitions (pruned scan), union, keep-last dedup on the logical key
  ``(symbol, interval, data_type, exchange, timestamp)``, and rewrite
  *only those partitions* via dynamic partition overwrite — the MERGE
  touches the same files the reference would, no full-table rewrite.

At 100 TB: the merge shuffles only the touched partitions' rows (pruned by
partition predicates pushed into the parquet scan), dedup partial-aggregates
map-side, and dynamic overwrite keeps the write incremental.  Late/corrected
data of any age lands correctly (unbounded-lateness corrections, T4).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.merge import INGEST_SEQ
from crypto_data_ingestion_module_spark.operators.dedup import dedup_keep_last

PARTITION_COLS = ("symbol", "interval", "data_type", "exchange", "date")
LOGICAL_KEY = ("symbol", "interval", "data_type", "exchange", "timestamp")


def _with_date(df: DataFrame) -> DataFrame:
    """Derive the yyyyMMdd partition date (reference 533)."""
    if "date" in df.columns:
        return df
    return df.withColumn("date", F.date_format("timestamp", "yyyyMMdd"))


def write_lake(
    df: DataFrame,
    root: str,
    mode: str = "append",
    partition_cols: Sequence[str] = PARTITION_COLS,
) -> None:
    """K1: partitioned Parquet write of canonical candles.

    Dynamic partition overwrite is pinned per-write so an overwrite from
    a STATIC-mode consumer session never wipes untouched partitions.
    """
    out = _with_date(df)
    if INGEST_SEQ not in out.columns:
        out = out.withColumn(INGEST_SEQ, F.lit(0).cast("long"))
    (
        out.write.partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode)
        .parquet(root)
    )


def _lake_exists(spark: SparkSession, root: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FS API —
    ``os.path.exists`` is always False for s3a://, hdfs://, etc., which
    would silently route every upsert to the bootstrap overwrite."""
    try:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(root)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(path))
    except Exception:
        return os.path.exists(root)


def read_lake(spark: SparkSession, root: str) -> DataFrame:
    """Schema-on-read scan of the lake; partition filters prune to files."""
    return spark.read.parquet(root)


def _hadoop_fs(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs


def _staged_partition_dirs(spark: SparkSession, base: str) -> list[str]:
    """Relative partition directories (``symbol=…/…/date=…``) under a
    staged write — the dirs holding parquet files."""
    jvm, fs = _hadoop_fs(spark, base)
    base_path = jvm.org.apache.hadoop.fs.Path(base)
    base_abs = fs.makeQualified(base_path).toUri().getPath()
    out: set[str] = set()
    it = fs.listFiles(base_path, True)
    while it.hasNext():
        f = it.next()
        p = f.getPath()
        if not p.getName().endswith(".parquet"):
            continue
        d = p.getParent().toUri().getPath()
        rel = d[len(base_abs):].lstrip("/")
        if rel:
            out.add(rel)
    return sorted(out)


def stage_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    root: str,
    key_cols: Sequence[str] = LOGICAL_KEY,
    batch_seq: int | None = None,
) -> str:
    """Phase 1 of the atomic upsert: compute the merge and write it to a
    STAGING directory beside the lake.  The lake itself is untouched — a
    job killed any time during this phase loses nothing but the staging
    dir (picked up by the next run's cleanup or left for gc).
    """
    assert _lake_exists(spark, root), "stage_upsert requires an existing lake"
    import uuid

    incoming = _with_date(incoming)
    existing = read_lake(spark, root)

    if batch_seq is None:
        row = existing.agg(F.max(INGEST_SEQ).alias("m")).first()
        batch_seq = int(row["m"] or 0) + 1
    if INGEST_SEQ not in incoming.columns:
        incoming = incoming.withColumn(INGEST_SEQ, F.lit(batch_seq).cast("long"))

    # Prune the merge to the partitions the batch touches: collect the
    # (small) distinct partition tuples driver-side and push them down as
    # partition predicates — the scan then reads only those directories.
    touched = [
        tuple(r)
        for r in incoming.select(*PARTITION_COLS).distinct().collect()
    ]
    pred = F.lit(False)
    for t in touched:
        clause = F.lit(True)
        for c, v in zip(PARTITION_COLS, t):
            clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    existing_touched = existing.filter(pred)

    merged = dedup_keep_last(
        existing_touched.unionByName(incoming.select(*existing_touched.columns)),
        keys=list(key_cols),
        order_col=INGEST_SEQ,
    )

    # Staged write: the merge reads the live files and writes somewhere
    # ELSE, so there is no destructive read-write overlap (this replaces
    # the previous localCheckpoint materialization — cheaper, and the
    # failure window where dynamic overwrite had already deleted a
    # partition it was about to rewrite is gone entirely).
    staging = f"{root.rstrip('/')}__staging__{uuid.uuid4().hex[:8]}"
    merged.write.partitionBy(*PARTITION_COLS).mode("overwrite").parquet(staging)
    return staging


def commit_upsert(spark: SparkSession, staging: str, root: str) -> None:
    """Phase 2: swap staged partitions into the lake via per-directory
    renames (atomic on HDFS/POSIX; on object stores use a manifest-based
    table format instead).  Each touched partition's previous content is
    renamed to a backup root first, so a kill mid-swap leaves every
    partition either fully old or fully new — never missing, never mixed.
    Backups and staging are deleted only after every swap succeeded.
    """
    jvm, fs = _hadoop_fs(spark, staging)
    Path = jvm.org.apache.hadoop.fs.Path
    backup = f"{staging}.bak"
    for rel in _staged_partition_dirs(spark, staging):
        src = Path(f"{staging}/{rel}")
        dst = Path(f"{root.rstrip('/')}/{rel}")
        if fs.exists(dst):
            bdst = Path(f"{backup}/{rel}")
            fs.mkdirs(bdst.getParent())
            fs.rename(dst, bdst)
        else:
            fs.mkdirs(dst.getParent())
        fs.rename(src, dst)
    fs.delete(Path(staging), True)
    fs.delete(Path(backup), True)


def upsert_lake(
    spark: SparkSession,
    incoming: DataFrame,
    root: str,
    key_cols: Sequence[str] = LOGICAL_KEY,
    batch_seq: int | None = None,
) -> None:
    """K2: MERGE-style keep-last upsert into the lake — atomic two-phase.

    Newest arrival wins per logical key.  ``batch_seq`` stamps the
    incoming batch's arrival order; by default it is one greater than the
    current lake maximum, so successive upserts strictly supersede.
    Re-delivering an identical batch with the same ``batch_seq`` is
    idempotent (ties resolve by payload, which is then equal).

    Durability: :func:`stage_upsert` writes the merge to a staging dir
    (lake untouched), :func:`commit_upsert` swaps partitions in via
    renames.  A failure before commit loses only staging; a failure
    mid-commit leaves each partition wholly old or wholly new with the
    old content preserved in the backup dir.  (The reference overwrites
    its day-file in place, crypto_collector.py:542-556 — a mid-write kill
    there truncates the file.)
    """
    incoming = _with_date(incoming)

    if not _lake_exists(spark, root):
        write_lake(incoming, root, mode="overwrite")
        return

    staging = stage_upsert(spark, incoming, root, key_cols, batch_seq)
    commit_upsert(spark, staging, root)


def partition_file_stats(spark: SparkSession, root: str) -> list[dict]:
    """Per-partition (dir, n_files, total_bytes) via a recursive Hadoop FS
    walk — driver-side, but bounded by partition count (the same listing
    Spark's own scan planning performs), not row count."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root_path = jvm.org.apache.hadoop.fs.Path(root)
    fs = root_path.getFileSystem(conf)
    stats: dict[str, dict] = {}
    it = fs.listFiles(root_path, True)  # recursive
    while it.hasNext():
        f = it.next()
        p = f.getPath()
        name = p.getName()
        if not name.endswith(".parquet"):
            continue
        part_dir = str(p.getParent().toUri().getPath())
        s = stats.setdefault(
            part_dir, {"dir": part_dir, "n_files": 0, "total_bytes": 0}
        )
        s["n_files"] += 1
        s["total_bytes"] += f.getLen()
    return sorted(stats.values(), key=lambda s: s["dir"])


def compact_lake(
    spark: SparkSession,
    root: str,
    max_files_per_partition: int = 1,
    partition_cols: Sequence[str] = PARTITION_COLS,
) -> list[str]:
    """OPTIMIZE-style small-file compaction (K2 hygiene).

    Successive dynamic-overwrite upserts leave each partition with as
    many files as tasks that wrote it; at 100 TB daily upserts this
    degrades scan planning (file-listing cost) and read throughput (row
    groups too small for efficient IO).  This pass rewrites ONLY the
    partitions whose file count exceeds ``max_files_per_partition``:
    a partition-pruned read, repartition by the partition key (one task →
    one file per partition), localCheckpoint to sever lineage from the
    files being replaced, then dynamic-overwrite.  Content — including
    ``_ingest_seq`` arrival stamps, so later upserts still supersede
    correctly — is byte-identical (asserted in tests).

    Returns the rewritten partition directories.
    """
    breached = [
        s["dir"]
        for s in partition_file_stats(spark, root)
        if s["n_files"] > max_files_per_partition
    ]
    if not breached:
        return []
    # partition-pruned scan of only the breached directories: rebuild the
    # partition-column tuple each dir encodes, then filter the lake scan
    pred = F.lit(False)
    for d in breached:
        clause = F.lit(True)
        for kv in d.split("/"):
            if "=" in kv:
                c, v = kv.split("=", 1)
                if c in partition_cols:
                    clause = clause & (F.col(c) == F.lit(v))
        pred = pred | clause
    doomed = read_lake(spark, root).filter(pred)
    compacted = doomed.repartition(*[F.col(c) for c in partition_cols])
    compacted = compacted.localCheckpoint(eager=True)
    (
        compacted.write.partitionBy(*partition_cols)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(root)
    )
    return breached
