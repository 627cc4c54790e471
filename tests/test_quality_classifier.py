"""Hashed linear classifier inference (r12, X4): hand-computed
semantics pins — the registered row's oracle checks corpus-scale
parity; these recompute the md5 weight table driver-side with plain
hashlib and assert the margins on literal documents."""

import hashlib

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.text import (
    LINEAR_MODEL_TAG,
    hashed_bucket_weight,
    hashed_token_bucket,
)

N_BUCKETS = 4096


def _py_bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _py_weight(bucket: int) -> int:
    h = hashlib.md5(f"{LINEAR_MODEL_TAG}:{bucket}".encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


def test_bucket_and_weight_match_stdlib(spark):
    toks = ["alpha", "beta", "gamma", "zz", "longertokenhere"]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    rows = df.select(
        "tok",
        hashed_token_bucket("tok", N_BUCKETS).alias("b"),
        hashed_bucket_weight(
            hashed_token_bucket("tok", N_BUCKETS)
        ).alias("w"),
    ).collect()
    for r in rows:
        assert r["b"] == _py_bucket(r["tok"]), r
        assert r["w"] == _py_weight(_py_bucket(r["tok"])), r
        assert -1000 <= r["w"] <= 1000


def test_classifier_margin_hand_computed(spark, monkeypatch):
    # plans.queries must be imported before any plans submodule (the
    # registry's documented import-order rule)
    import crypto_data_ingestion_module_spark.plans.queries  # noqa: F401
    import crypto_data_ingestion_module_spark.plans.extensions as ext

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha"),     # repeated token counts twice
            (2, "Gamma NOPE42 zz"),      # only all-lowercase tokens score
            (3, "!!! 123"),              # no scoring tokens: row absent
            (4, None),                   # NULL text: row absent
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(
        ext, "_t", lambda spark, sf_dir, name: docs
    )
    out = {r["doc_id"]: r for r in ext._quality_classifier(spark, "x").collect()}
    assert set(out) == {1, 2}

    w = lambda t: _py_weight(_py_bucket(t))
    s1 = 2 * w("alpha") + w("beta")
    assert out[1]["n_feats"] == 3 and out[1]["score"] == s1
    assert out[1]["quality_ppm"] == 1_000_000 * (s1 + 3000) // 6000
    assert out[1]["keep"] == (s1 >= 0)

    s2 = w("zz")  # 'Gamma' (uppercase) and 'NOPE42' filtered
    assert out[2]["n_feats"] == 1 and out[2]["score"] == s2


def test_classifier_scan_is_pruned(spark):
    """Inference must read ONLY (doc_id, text) from the documents scan —
    a classifier pass that drags the full row width through the token
    explode is the 100 TB mistake this pin exists to catch."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["quality_classifier_scores"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans
    for ln in scans:
        assert "doc_id" in ln and "text" in ln
        for extra in ("lang", "source", "n_chars"):
            assert extra not in ln, ln
    # the NULL-text filter reached the scan
    assert any("isnotnull(text" in ln for ln in scans), scans
