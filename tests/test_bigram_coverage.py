"""Reference-corpus bigram coverage (r13, X4): hand-computed semantics
pins for the CCNet-style perplexity-filter stand-in.  The registered
row's oracle checks corpus-scale parity; these pin the bigram
construction (0-based transform index vs 1-based element_at), the
reference threshold, and the candidate/reference split on literal
documents."""

import pyspark.sql.functions as F


def _run(spark, docs):
    import crypto_data_ingestion_module_spark.plans.queries  # noqa: F401
    import crypto_data_ingestion_module_spark.plans.extensions as ext

    df = spark.createDataFrame(docs, "doc_id long, text string")
    orig = ext._t
    try:
        ext._t = lambda spark, sf_dir, name: df
        return {
            r["doc_id"]: (r["n_bigrams"], r["n_covered"], r["coverage_ppm"])
            for r in ext._bigram_coverage(spark, "x").collect()
        }
    finally:
        ext._t = orig


def test_bigram_coverage_hand_computed(spark):
    docs = [
        # reference half (even ids): "a b" x3 and "b c" x2 across docs
        (0, "a b c a b"),      # bigrams: a b, b c, c a, a b
        (2, "a b x"),          # a b, b x
        (4, "b c y"),          # b c, c y
        # candidates (odd ids)
        (1, "a b c"),          # a b (ref 3x, covered), b c (2x, NOT >= 3)
        (3, "z z z"),          # z z, z z — nothing covered
        (5, "a"),              # no bigrams: row absent
        (7, None),             # null text: absent
    ]
    got = _run(spark, docs)
    assert set(got) == {1, 3}
    # candidate 1: 2 bigrams, only "a b" covered (count 3 >= 3)
    assert got[1] == (2, 1, 500000)
    assert got[3] == (2, 0, 0)


def test_bigram_tokenization_is_letters_only_lowercase(spark):
    docs = [
        (0, "Foo BAR foo bar Foo BAR foo bar"),  # "foo bar" appears 4x
        (1, "FOO bar42baz"),  # tokens: foo, bar, baz -> foo bar, bar baz
    ]
    got = _run(spark, docs)
    # "foo bar" covered (>= 3 in reference); "bar baz" not
    assert got[1] == (2, 1, 500000)


def test_coverage_plan_has_no_cartesian(spark):
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["bigram_coverage_scores"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_coverage_plan_tokenizes_once_per_branch(spark):
    """The regexp tokenizer must be materialized into a column before
    the bigram transform (r14): inlining it re-tokenized each row up to
    three times (slice source, size, element_at).  One occurrence per
    scan branch (reference side + candidate side) is the floor."""
    import crypto_data_ingestion_module_spark.plans.queries as q

    df = q.QUERY_SPECS["bigram_coverage_scores"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_extract_all") <= 2, plan.count(
        "regexp_extract_all"
    )
