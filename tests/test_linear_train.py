"""In-engine perceptron training (r13, X4): hand-computed semantics
pins.  The registered rows' oracles check corpus-scale parity against
unrolled DuckDB CTEs; these recompute the batch-perceptron recurrence
driver-side in plain Python on literal feature frames and assert the
trained weights, plus the operator's invariants (feature-agnosticism,
partitioning-independence, pruned scan, broadcast inference)."""

import collections

import pyspark.sql.functions as F

from crypto_data_ingestion_module_spark.operators.linear import (
    score_with_weights,
    train_perceptron_hashed,
)


def _py_train(rows, labels, iterations):
    """Reference batch perceptron: rows = [(k, bucket, cnt)]."""
    fm = collections.defaultdict(dict)
    for k, b, c in rows:
        fm[k][b] = fm[k].get(b, 0) + c
    w = collections.defaultdict(int)
    for _ in range(iterations):
        miss = [
            k
            for k, y in labels.items()
            if y * sum(w[b] * c for b, c in fm[k].items()) <= 0
        ]
        for k in miss:
            for b, c in fm[k].items():
                w[b] += labels[k] * c
    return {b: v for b, v in w.items() if v != 0}


FEATS = [
    # two positive docs share bucket 1; the negative doc leans on 2
    (1, 1, 3), (1, 2, 1),
    (2, 1, 2), (2, 3, 1),
    (3, 2, 4), (3, 3, 1),
    (4, 1, 1), (4, 2, 1), (4, 3, 1),
]
LABELS = {1: 1, 2: 1, 3: -1, 4: -1}


def _frames(spark, feats=FEATS, labels=LABELS):
    f = spark.createDataFrame(feats, "doc_id long, bucket int, cnt long")
    l = spark.createDataFrame(
        [(k, y) for k, y in labels.items()], "doc_id long, y long"
    )
    return f, l


def test_trained_weights_match_python_reference(spark):
    f, l = _frames(spark)
    for iters in (1, 2, 5):
        got = {
            r["bucket"]: r["w"]
            for r in train_perceptron_hashed(f, l, iters).collect()
        }
        assert got == _py_train(FEATS, LABELS, iters), iters


def test_training_is_partitioning_independent(spark):
    f, l = _frames(spark)
    base = {
        r["bucket"]: r["w"]
        for r in train_perceptron_hashed(f, l, 4).collect()
    }
    shuffled = {
        r["bucket"]: r["w"]
        for r in train_perceptron_hashed(f.repartition(7), l, 4).collect()
    }
    assert base == shuffled


def test_unlabeled_and_featureless_examples_are_inert(spark):
    # doc 9 has features but no label: never trains; doc 10 has a label
    # but no features: missed every round, adds nothing to any update
    f, l = _frames(
        spark,
        feats=FEATS + [(9, 1, 100)],
        labels={**LABELS, 10: -1},
    )
    got = {
        r["bucket"]: r["w"]
        for r in train_perceptron_hashed(f, l, 3).collect()
    }
    assert got == _py_train(FEATS, LABELS, 3)


def test_score_with_weights_margins(spark):
    f, l = _frames(spark)
    w = train_perceptron_hashed(f, l, 3)
    wd = {r["bucket"]: r["w"] for r in w.collect()}
    got = {
        r["doc_id"]: r["margin"]
        for r in score_with_weights(f, w).collect()
    }
    fm = collections.defaultdict(dict)
    for k, b, c in FEATS:
        fm[k][b] = c
    for k in LABELS:
        assert got[k] == sum(wd.get(b, 0) * c for b, c in fm[k].items())


def test_scoring_plan_is_broadcast_no_shuffle_join(spark):
    f, l = _frames(spark)
    w = train_perceptron_hashed(f, l, 2)
    plan = (
        score_with_weights(f, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_registered_rows_scan_only_doc_id_and_text(spark):
    """Training must read ONLY (doc_id, text) from the documents scan —
    feature extraction that drags the full row width is the 100 TB
    mistake this pin exists to catch."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["quality_classifier_trained_scores"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans
    for ln in scans:
        assert "doc_id" in ln and "text" in ln
        for extra in ("lang", "source", "n_chars"):
            assert extra not in ln, ln


def test_trained_model_beats_majority_class(spark):
    """The distillation must actually learn: agreement with the teacher
    above the positive-class rate (the all-positive predictor's score).
    Guards against feature regressions that collapse the model back to
    the majority class."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["quality_classifier_trained_scores"].spark(
        spark, "/root/testdata/sf0.01"
    )
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("agree").cast("int")).alias("agree"),
        F.sum((F.col("teacher_y") == 1).cast("int")).alias("pos"),
    ).collect()[0]
    assert r["agree"] > r["pos"], (r["agree"], r["pos"], r["n"])
    assert r["agree"] >= int(0.95 * r["n"])


def test_holdout_generalizes_beyond_majority_class(spark):
    """Train/test split: the model trained on the even-doc_id half must
    beat the all-positive predictor on the UNSEEN odd half — the
    generalization measurement, not just training-set fit."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["quality_classifier_holdout"].spark(
        spark, "/root/testdata/sf0.01"
    )
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("agree").cast("int")).alias("agree"),
        F.sum((F.col("teacher_y") == 1).cast("int")).alias("pos"),
    ).collect()[0]
    assert r["agree"] > r["pos"], (r["agree"], r["pos"], r["n"])
    assert r["agree"] >= int(0.95 * r["n"])


def test_stream_serving_equals_batch_scoring(spark):
    """The stateless streaming serving row must reproduce the batch
    trained-scores output EXACTLY — stateless streaming == batch is the
    contract that makes it oracle-pairable."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["teacher_y"], r["margin"], r["keep"], r["agree"])
        for r in q.QUERY_SPECS["stream_classifier_scores"]
        .spark(spark, sf)
        .collect()
    }
    want = {
        r["doc_id"]: (r["teacher_y"], r["margin"], r["keep"], r["agree"])
        for r in q.QUERY_SPECS["quality_classifier_trained_scores"]
        .spark(spark, sf)
        .collect()
    }
    assert got == want
