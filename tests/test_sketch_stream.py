"""Streaming sketch-partial maintenance (streaming/sketch_stream.py):
streamed partials answer EXACTLY like the one-shot operators, and
re-delivered micro-batches append nothing."""

import glob
import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.sketch import (
    frequent_items_exact,
)
from crypto_data_ingestion_module_spark.operators.sketch_store import (
    approx_distinct_over_range,
    frequent_items_exact_from_partials,
    store_mg_partials,
)
from crypto_data_ingestion_module_spark.session import load_table
from crypto_data_ingestion_module_spark.sinks.snapshot import (
    current_version,
    read_manifest,
    read_snapshot,
)
from crypto_data_ingestion_module_spark.streaming.sketch_stream import (
    stream_hll_partials,
    stream_mg_partials,
)
from tests.conftest import SF_SMALL

K = 49


def _tokens(spark):
    return (
        load_table(spark, SF_SMALL, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def _write_batches(df, tmp_path, in_dir, key_col, n=3):
    """Split ``df`` into n parquet files arriving as separate
    micro-batches (maxFilesPerTrigger=1)."""
    os.makedirs(in_dir)
    for i in range(n):
        tmp = str(tmp_path / f"split{i}")
        df.filter(F.col(key_col) % n == i).coalesce(1).write.parquet(tmp)
        os.rename(
            glob.glob(tmp + "/*.parquet")[0],
            os.path.join(in_dir, f"b{i}.parquet"),
        )


def test_streamed_mg_partials_answer_equals_one_shot(spark, tmp_path):
    toks = _tokens(spark).withColumn(
        "split_key", F.abs(F.xxhash64("tok"))
    )
    in_dir = str(tmp_path / "in")
    _write_batches(toks, tmp_path, in_dir, "split_key")

    src = (
        spark.readStream.schema(toks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    root = str(tmp_path / "mg")
    q = stream_mg_partials(
        src, root, str(tmp_path / "ck"), "tok", stratum="lang", k=K
    )
    q.awaitTermination(120)

    # one manifest commit per non-empty micro-batch, ledger carries the
    # stream-scoped ids
    v = current_version(spark, root)
    assert v == 3
    assert len(read_manifest(spark, root, v)["applied_ids"]) == 3

    fact = _tokens(spark)
    got = [
        tuple(r)
        for r in frequent_items_exact_from_partials(
            fact, read_snapshot(spark, root), "tok", k=K
        ).collect()
    ]
    want = [
        (r["item"], r["cnt"])
        for r in frequent_items_exact(fact, "tok", k=K).collect()
    ]
    assert got == want
    assert got, "empty heavy-hitter set"

    # replaying one batch identity appends nothing (no version bump)
    store_mg_partials(
        spark,
        toks,
        "tok",
        root,
        stratum="lang",
        k=K,
        applied_id=read_manifest(spark, root, v)["applied_ids"][0],
    )
    assert current_version(spark, root) == v


def test_streamed_hll_partials_equal_from_scratch_sketch(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    in_dir = str(tmp_path / "in")
    _write_batches(ev, tmp_path, in_dir, "event_id")

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    root = str(tmp_path / "hll")
    q = stream_hll_partials(
        src,
        root,
        str(tmp_path / "ck"),
        "user_id",
        ["event_type"],
        stratum="day",
    )
    q.awaitTermination(120)

    merged = {
        (r.event_type, r.approx_distinct, r.n_rows)
        for r in approx_distinct_over_range(
            spark, root, ["event_type"]
        ).collect()
    }
    want = {
        (r.event_type, r.approx, r.n_rows)
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    # register-wise max union is lossless: streamed == from-scratch,
    # bit-for-bit, regardless of the micro-batch split
    assert merged == want
