"""Streaming join-view maintenance (streaming/ivm_stream.py): alternating
side streams produce a view identical to a from-scratch join of the
accumulated sides, and checkpoint restarts re-apply nothing."""

import glob
import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.ivm import (
    read_join_view,
    recompute_join,
)
from crypto_data_ingestion_module_spark.sinks.snapshot import (
    current_version,
    read_manifest,
)
from crypto_data_ingestion_module_spark.streaming.ivm_stream import (
    stream_join_view,
)


def _write_batches(df, tmp_path, in_dir, n, tag):
    os.makedirs(in_dir)
    for i in range(n):
        tmp = str(tmp_path / f"{tag}{i}")
        df.filter(F.col("k") % n == i).coalesce(1).write.parquet(tmp)
        os.rename(
            glob.glob(tmp + "/*.parquet")[0],
            os.path.join(in_dir, f"b{i}.parquet"),
        )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streamed_view_equals_recompute_and_restart_is_noop(spark, tmp_path):
    left = spark.createDataFrame(
        [(k, f"l{k}") for k in range(12)], "k long, lval string"
    )
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(0, 12, 2)] + [(2, "r2b")],
        "k long, rval string",
    )
    lin, rin = str(tmp_path / "lin"), str(tmp_path / "rin")
    _write_batches(left, tmp_path, lin, 3, "ls")
    _write_batches(right, tmp_path, rin, 2, "rs")
    root = str(tmp_path / "view")
    lck, rck = str(tmp_path / "lck"), str(tmp_path / "rck")

    def _drain(in_dir, side, ck, schema):
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = stream_join_view(src, side, root, "k", ck)
        q.awaitTermination(120)

    # alternating availableNow drains = the documented sequential
    # single-maintainer schedule
    _drain(lin, "left", lck, left.schema)
    _drain(rin, "right", rck, right.schema)
    got = _rows(read_join_view(spark, root))
    want = _rows(recompute_join(spark, root, "k"))
    assert got == want
    assert len(got) == 7  # 6 even keys + the duplicate k=2 right row

    # restart both streams from their checkpoints: no new files -> no
    # micro-batches -> no version bumps anywhere
    vers = {
        sub: current_version(spark, f"{root}/{sub}")
        for sub in ("left", "right", "view")
    }
    _drain(lin, "left", lck, left.schema)
    _drain(rin, "right", rck, right.schema)
    for sub, v in vers.items():
        assert current_version(spark, f"{root}/{sub}") == v

    # late left file arrives after a restart: only the delta applies
    extra = spark.createDataFrame([(2, "l2-late")], "k long, lval string")
    extra.coalesce(1).write.parquet(str(tmp_path / "xtra"))
    os.rename(
        glob.glob(str(tmp_path / "xtra") + "/*.parquet")[0],
        os.path.join(lin, "b_late.parquet"),
    )
    _drain(lin, "left", lck, left.schema)
    got2 = _rows(read_join_view(spark, root))
    assert got2 == _rows(recompute_join(spark, root, "k"))
    assert len(got2) == 9  # k=2 now 2 left x 2 right

    # the view ledger carries stream-scoped ids (replay immunity axis)
    v = current_version(spark, f"{root}/view")
    ids = read_manifest(spark, f"{root}/view", v)["applied_ids"]
    assert all(i.startswith("ivm-view-") for i in ids)
