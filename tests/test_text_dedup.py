

# ---------------------------------------------------------------------------
# remove_duplicate_passages (sub-document exact span dedup)
# ---------------------------------------------------------------------------


def _passages(spark, rows, tile_words=3):
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        remove_duplicate_passages,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tiles"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_passages(df, tile_words).collect()
    }


def test_passages_first_occurrence_kept_later_removed(spark):
    # tile size 3: doc 1 = [a b c][d e f]; doc 2 repeats [a b c] then
    # unique tail [x y z] -> doc 2 loses its first tile only.
    got = _passages(
        spark,
        [(1, "a b c d e f"), (2, "a b c x y z")],
    )
    assert got[1] == (2, 0, "a b c d e f")
    assert got[2] == (2, 1, "x y z")


def test_passages_intra_doc_repeat_and_short_tail(spark):
    # [p q r][p q r][s] -> second tile removed, short tail tile kept.
    got = _passages(spark, [(7, "p q r p q r s")])
    assert got[7] == (3, 1, "p q r s")


def test_passages_empty_and_null_docs_survive_with_audit_zeros(spark):
    got = _passages(spark, [(1, ""), (2, None), (3, "k l m")])
    assert got[1] == (0, 0, "")
    assert got[2] == (0, 0, "")
    assert got[3] == (1, 0, "k l m")


def test_passages_first_is_global_min_doc_then_idx(spark):
    # the shared tile appears at idx 1 of doc 1 and idx 0 of doc 2:
    # doc order wins over tile position (min struct (doc_id, idx)).
    got = _passages(spark, [(1, "u v w a b c"), (2, "a b c")])
    assert got[1] == (2, 0, "u v w a b c")
    assert got[2] == (1, 1, "")


def test_minhash_md5_twin_semantics(spark):
    # The oracle-paired md5 twin: exact duplicates collide in every
    # band and match on all 16 minima (est 1.0); disjoint docs never
    # become candidates.  (Probabilistic recall properties live with
    # the fast xxhash64 twin's tests; this pins the paired machinery.)
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        minhash_lsh_pairs_md5,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, dup),
            (2, dup),
            (3, "completely different words about snapshot lake manifests"),
        ],
        ["doc_id", "text"],
    )
    out = minhash_lsh_pairs_md5(docs).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["n_match"] == 16
    assert pairs[(1, 2)]["est_jaccard"] == 1.0


def test_containment_catches_the_jaccard_blind_quote(spark):
    """The operator's reason to exist: a short doc quoted verbatim
    inside a much longer one has containment 1.0 from the short side
    while Jaccard stays low — a resemblance-only threshold keeps both
    copies, the containment gate catches the inclusion."""
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i} z{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        ["doc_id", "text"],
    )
    got = shingle_containment_pairs(docs, threshold_ppm=800_000, n=3).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["cont_ab_ppm"] == 1_000_000  # every quote shingle is in 2
    assert row["cont_ba_ppm"] < 100_000     # the long side barely overlaps
    # and the same pair is INVISIBLE to a 0.5-Jaccard gate
    assert not ngram_jaccard_pairs(docs, threshold=0.5, n=3).collect()
