"""Benchmark decontamination (training-corpus hygiene).

Flags training documents that share word n-grams with a held-out
benchmark / evaluation set — the standard n-gram-collision
decontamination applied to LLM training corpora (GPT-3 appendix C and
The Pile both remove 13-gram collisions; the n is a parameter here
because the right value depends on tokenizer and document length).

Reference parity: the reference collector has no decontamination surface
(SURVEY §2.10 capability extension for LLM-pipeline curation, same class
as sampling.py / text_dedup.py).

100 TB shape: the corpus side is shingled with the SAME exploded-n-gram
kernel as the near-dup operators (one projection pass, no second scan
for set sizes); the benchmark side is DISTINCT-ed and **broadcast** —
eval suites are megabytes while corpora are terabytes, so the join must
never shuffle the corpus shingles by key just to meet a tiny build side.
Hit counting is then a broadcast left-outer join plus one map-side-
combined hash aggregate per document: the corpus is read exactly once
and the only shuffle is the final per-doc aggregate, whose key (doc id)
is the natural partitioning of every downstream curation step.  If the
"benchmark" is itself large (decontaminating against another corpus),
pass ``broadcast_benchmark=False`` and the same plan degrades to a
shuffle hash join on the shingle, which is the near-dup join shape and
equally scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.text_dedup import _shingle_rows


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    min_common: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination stats against a benchmark set.

    Returns one row per ``docs`` row: ``(doc_id, n_shingles, n_hits,
    contaminated)`` where ``n_hits`` is the number of the document's
    DISTINCT word n-grams that also occur anywhere in ``benchmark`` and
    ``contaminated = n_hits >= min_common``.  Documents with zero hits
    are kept (flag false) so the output is a full audit table, not just
    the removal list.
    """
    # NULL text tokenizes to NULL and the shingle explode would DROP the
    # row — silently losing the document from the audit (and from the
    # clean corpus).  Coalesce to '' so such docs surface with their one
    # empty shingle instead of disappearing.
    def _nn(df: DataFrame, col: str) -> DataFrame:
        return df.withColumn(col, F.coalesce(F.col(col), F.lit("")))

    bench_sh = (
        _shingle_rows(
            _nn(benchmark, bench_text_col or text_col),
            n,
            bench_text_col or text_col,
            id_col,
        )
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = _shingle_rows(_nn(docs, text_col), n, text_col, id_col)
    # Benchmark shingles are distinct, so the left join preserves the
    # per-doc shingle count: count(*) == |shingle set| and count(_hit)
    # counts the collisions, in the same single aggregate.
    return (
        doc_sh.join(bench_sh, "shingle", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") >= min_common)
    )


def contamination_flags_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    min_common: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    num_bits: int | None = None,
    seeds: tuple[int, ...] | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """:func:`contamination_flags`, Bloom-prefiltered — same answer.

    Builds a Bloom filter over the benchmark's distinct shingles
    (operators/bloom.py) and tests every corpus shingle JVM-side BEFORE
    the exact confirm join: at 100 TB the corpus-side shingle stream is
    the dominant cost, and with FPR p only (true hits + p·rest) shingles
    ever reach the broadcast hash join — the rest die inside the scan
    stage's codegen.  No false negatives means every true collision
    still takes the exact join, so the output is row-for-row identical
    to the exact operator (the property the paired oracle checks).

    The per-doc shingle count must see ALL shingles, so in the
    broadcast regime the prefilter is folded into the JOIN CONDITION
    (``bloom_pass AND shingle match``) rather than a WHERE: one scan,
    one aggregate, same as the exact plan, just with a near-empty join
    probe side.  With ``broadcast_benchmark=False`` (benchmark too big
    to broadcast — decontaminating against another corpus) the plan
    splits instead: totals aggregate by doc id, and ONLY the
    bloom-candidate shingles shuffle into the confirm join — this is
    the regime where the prefilter pays directly, because the corpus-
    side SHUFFLE shrinks by the probe-reduction factor.  Size
    ``num_bits`` to the benchmark's shingle count there (m ≈ 20–30 bits
    per key keeps FPR under 1%; a saturated bitset silently degrades to
    pass-everything, still exact but pruning nothing).
    """
    from crypto_data_ingestion_module_spark.operators import bloom as bl

    kw: dict = {}
    if num_bits is not None:
        kw["num_bits"] = num_bits
    if seeds is not None:
        kw["seeds"] = seeds

    def _nn(df: DataFrame, col: str) -> DataFrame:
        return df.withColumn(col, F.coalesce(F.col(col), F.lit("")))

    bench_sh = (
        _shingle_rows(
            _nn(benchmark, bench_text_col or text_col),
            n,
            bench_text_col or text_col,
            id_col,
        )
        .select(F.col("shingle").alias("_bsh"))
        .distinct()
    )
    bitset = bl.bloom_bitset(bench_sh, "_bsh", **kw)
    doc_sh = bl.with_bloom_flag(
        _shingle_rows(_nn(docs, text_col), n, text_col, id_col),
        "shingle",
        bitset,
        flag="_cand",
        **kw,
    )
    if broadcast_benchmark:
        hit = F.broadcast(bench_sh.withColumn("_hit", F.lit(1)))
        return (
            doc_sh.join(
                hit, F.col("_cand") & (F.col("shingle") == F.col("_bsh")), "left"
            )
            .groupBy(F.col("id").alias(id_col))
            .agg(
                F.count(F.lit(1)).alias("n_shingles"),
                F.count("_hit").alias("n_hits"),
            )
            .withColumn("contaminated", F.col("n_hits") >= min_common)
        )
    # Shuffle-confirm regime: only candidates shuffle by shingle (both
    # shingle sets are per-side distinct, so the inner join emits one
    # row per true per-doc collision).
    totals = doc_sh.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        doc_sh.filter(F.col("_cand"))
        .join(bench_sh, F.col("shingle") == F.col("_bsh"))
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        totals.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0).cast("long")))
        .withColumn("contaminated", F.col("n_hits") >= min_common)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    min_common: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The clean corpus: ``docs`` minus benchmark-contaminated rows.

    Composition of :func:`contamination_flags` with a join back on the
    id — the flags table is doc-id-partitioned and tiny relative to the
    corpus, so the join is broadcast-able in practice; Spark's AQE picks
    that up from runtime stats without a hint here.
    """
    flags = contamination_flags(
        docs,
        benchmark,
        n=n,
        min_common=min_common,
        text_col=text_col,
        id_col=id_col,
        broadcast_benchmark=broadcast_benchmark,
    )
    keep = flags.filter(~F.col("contaminated")).select(id_col)
    return docs.join(keep, id_col, "left_semi")
