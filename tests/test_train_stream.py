"""Streaming perceptron training (r14, streaming/train_stream.py):
per-epoch micro-batch updates must be BIT-IDENTICAL to the batch
trainer at the same depth, for any file/batch split — the associative
-update property that makes a streaming trainer oracle-pairable."""

import os

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.linear import (
    examples_frame,
    train_perceptron_hashed,
)
from crypto_data_ingestion_module_spark.streaming.train_stream import (
    stream_train_perceptron,
)

FEATS = [
    # (doc_id, bucket, cnt)
    (1, 0, 3), (1, 2, 1),
    (2, 1, 2), (2, 2, 2),
    (3, 0, 1), (3, 1, 1), (3, 3, 4),
    (4, 3, 1),
    (5, 0, 2), (5, 4, 5),
    (6, 1, 3), (6, 4, 1),
]
LABELS = [(1, 1), (2, -1), (3, 1), (4, -1), (5, 1), (6, -1)]


def _frames(spark):
    feats = spark.createDataFrame(
        FEATS, "doc_id long, bucket int, cnt long"
    )
    labels = spark.createDataFrame(LABELS, "doc_id long, y long")
    return feats, labels


def _batch_weights(spark, iterations):
    feats, labels = _frames(spark)
    return {
        r["bucket"]: r["w"]
        for r in train_perceptron_hashed(
            feats, labels, iterations=iterations
        ).collect()
    }


def _stream_weights(spark, tmp_path, iterations, n_files, tag):
    feats, labels = _frames(spark)
    ex = examples_frame(feats, labels)
    inp = str(tmp_path / f"ex_{tag}")
    ex.repartition(n_files).write.mode("overwrite").parquet(inp)
    w = stream_train_perceptron(
        spark,
        inp,
        ex.schema,
        iterations=iterations,
        checkpoint_root=str(tmp_path / f"ck_{tag}"),
    )
    return {b: v for b, v in w.items()}


def test_streamed_epochs_equal_batch_iterations(spark, tmp_path):
    for iters in (1, 3, 5):
        got = _stream_weights(spark, tmp_path, iters, 2, f"i{iters}")
        want = _batch_weights(spark, iters)
        assert got == want, iters


def test_streamed_weights_are_batch_split_independent(spark, tmp_path):
    base = _stream_weights(spark, tmp_path, 3, 1, "s1")
    for n in (2, 3):
        assert _stream_weights(spark, tmp_path, 3, n, f"s{n}") == base, n


def test_epoch_drain_is_multi_batch(spark, tmp_path):
    """maxFilesPerTrigger=1 over a 3-file landing zone: the per-epoch
    partial-merge path is genuinely exercised across micro-batches
    (not one batch = trivially the batch trainer)."""
    feats, labels = _frames(spark)
    ex = examples_frame(feats, labels)
    inp = str(tmp_path / "ex_mb")
    ex.repartition(3).write.mode("overwrite").parquet(inp)
    files = [f for f in os.listdir(inp) if f.endswith(".parquet")]
    assert len(files) == 3
    w = stream_train_perceptron(
        spark, inp, ex.schema, iterations=2,
        checkpoint_root=str(tmp_path / "ck_mb"),
        max_files_per_trigger=1,
    )
    assert w == _batch_weights(spark, 2)


def test_registered_row_matches_batch_trainer_semantics(spark):
    """The registered streaming-trainer row at its own depth equals
    the batch trainer run at that depth over the same fixture corpus."""
    import crypto_data_ingestion_module_spark.plans.queries as q
    from crypto_data_ingestion_module_spark.plans.extensions import (
        _QC_STREAM_TRAIN_ITERS,
        _qc_feats_labels,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["bucket"]: r["w"]
        for r in q.QUERY_SPECS["stream_classifier_train"]
        .spark(spark, sf)
        .collect()
    }
    feats, labels = _qc_feats_labels(spark, sf)
    want = {
        r["bucket"]: r["w"]
        for r in train_perceptron_hashed(
            feats, labels, iterations=_QC_STREAM_TRAIN_ITERS
        ).collect()
    }
    assert got == want


def test_replayed_micro_batch_does_not_double_count(spark):
    """foreachBatch is at-least-once: re-delivering a batch_id must
    OVERWRITE its partial-update slot, not append a second copy
    (ADVICE r14 pin — an append-only accumulator double-counts on
    retry and silently breaks the batch-trainer bit-identity)."""
    from crypto_data_ingestion_module_spark.streaming.train_stream import (
        _EpochAccumulator,
    )

    feats, labels = _frames(spark)
    ex = examples_frame(feats, labels)
    acc = _EpochAccumulator({})
    acc(ex, 0)
    once = acc.partials()
    assert once  # the fixture produces misses at zero weights
    acc(ex, 0)  # simulated retry of the same micro-batch
    assert acc.partials() == once
    # a genuinely new batch still accumulates
    acc(ex, 1)
    assert len(acc.partials()) == 2 * len(once)
