"""BPE merge training as a DataFrame program — oracle-checkable.

The curation stack tokenizes with a fixed regex (functions/text); real
pipelines TRAIN their tokenizer on the corpus.  This module owns that
training loop (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016): count adjacent symbol pairs
weighted by word frequency, merge the most frequent pair everywhere,
repeat.

Representation: each distinct word is a space-separated symbol string
with sentinel spaces (`` h e l l o ``), so "merge pair (a,b)" is exactly
``replace(w, ' a b ', ' ab ')`` — whole-symbol aligned by the padding.
Both Spark and DuckDB implement ``replace`` as left-to-right,
non-rescanning, all-occurrences substitution (verified on the
overlapping ``' a a a a '`` case: both yield ``' aa a a '``), so the
merge step is bit-identical cross-engine.  NOTE the non-rescanning
detail: a run of 2k repeated symbols merges k times per ROUND, not
greedily within the round — a defined, engine-agreed variant of
greedy-left BPE.

Determinism: pair counts are integer sums; the winning pair breaks ties
by (count desc, lhs asc, rhs asc); symbol strings are ASCII ([a-z]+
words only), so string comparison is binary-identical in both engines.

Scale shape: the state is the DISTINCT-WORD table (vocabulary-sized,
not corpus-sized — the standard BPE trainer optimization); each round
is one explode + hash-agg + global top-1 (TakeOrdered) + a broadcast
1-row join.  The plan doubles per round (each round's words embed the
previous argmax lineage); ``checkpoint=True`` truncates per round for
deep merge tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pairs(s: Column) -> Column:
    """Adjacent symbol pairs of a symbol list (empty when < 2 symbols)."""
    idx = F.sequence(F.lit(1), F.size(s) - 1)
    return F.when(
        F.size(s) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(s, i).alias("lhs"),
                F.element_at(s, i + 1).alias("rhs"),
            ),
        ),
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    checkpoint: bool = False,
) -> DataFrame:
    """Train ``n_merges`` BPE merges; return the ordered merge table
    (rank, lhs, rhs, pair_count)."""
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy(
            F.concat(
                F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
            ).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges = []
    for i in range(n_merges):
        s = F.split(F.trim(F.col("w")), " ")
        best = (
            words.select("wc", F.explode(_pairs(s)).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
        )
        merges.append(
            best.select(
                F.lit(i + 1).alias("rank"), "lhs", "rhs", "pair_count"
            )
        )
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                F.replace(
                    F.col("w"),
                    F.concat(
                        F.lit(" "),
                        F.col("lhs"),
                        F.lit(" "),
                        F.col("rhs"),
                        F.lit(" "),
                    ),
                    F.concat(
                        F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" ")
                    ),
                ).alias("w"),
                "wc",
            )
        )
        if checkpoint:
            words = words.localCheckpoint(eager=True)

    out = merges[0]
    for mdf in merges[1:]:
        out = out.unionByName(mdf)
    return out


def bpe_vocab(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    checkpoint: bool = False,
) -> DataFrame:
    """The subword vocabulary AFTER ``n_merges`` rounds: each surviving
    symbol with its corpus token count — the encode-side complement of
    :func:`bpe_merges` (the segmented word table is the tokenizer)."""
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy(
            F.concat(
                F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
            ).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    for _ in range(n_merges):
        s = F.split(F.trim(F.col("w")), " ")
        best = (
            words.select("wc", F.explode(_pairs(s)).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
        )
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                F.replace(
                    F.col("w"),
                    F.concat(
                        F.lit(" "),
                        F.col("lhs"),
                        F.lit(" "),
                        F.col("rhs"),
                        F.lit(" "),
                    ),
                    F.concat(
                        F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" ")
                    ),
                ).alias("w"),
                "wc",
            )
        )
        if checkpoint:
            words = words.localCheckpoint(eager=True)
    s = F.split(F.trim(F.col("w")), " ")
    return (
        words.select("wc", F.explode(s).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("wc").alias("n_tokens"))
    )


def bpe_segment_table(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    checkpoint: bool = False,
) -> DataFrame:
    """Train the merge rounds and return the word-level segment table
    ``(word, n_sym)``: each distinct [a-z]+ word with its BPE token
    count after ``n_merges`` rounds.  This is the serving ARTIFACT — at
    100 TB it is trained once, stored (vocabulary-sized: it does not
    grow with corpus bytes), and every encode pass reads it instead of
    replaying the trainer."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .withColumn(
            "w",
            F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")),
        )
    )
    for _ in range(n_merges):
        s = F.split(F.trim(F.col("w")), " ")
        best = (
            words.select("wc", F.explode(_pairs(s)).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
        )
        words = words.crossJoin(F.broadcast(best)).select(
            "word",
            "wc",
            F.replace(
                F.col("w"),
                F.concat(
                    F.lit(" "), F.col("lhs"), F.lit(" "), F.col("rhs"),
                    F.lit(" "),
                ),
                F.concat(F.lit(" "), F.col("lhs"), F.col("rhs"), F.lit(" ")),
            ).alias("w"),
        )
        if checkpoint:
            words = words.localCheckpoint(eager=True)
    return words.select(
        "word", F.size(F.split(F.trim(F.col("w")), " ")).alias("n_sym")
    )


def bpe_encode_with_segments(
    docs: DataFrame,
    segments: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents against a PRECOMPUTED segment table (the stored
    merge-table artifact from :func:`bpe_segment_table`): one corpus
    scan, one broadcast join, one hash aggregate — the 100 TB serving
    path; per-document work never replays a merge."""
    return (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .join(F.broadcast(segments), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
        )
    )


def bpe_encode_docs(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the trained merge table — the encode
    side of :func:`bpe_merges`.  Returns per-document
    ``(id, n_words, n_tokens)``: its [a-z]+ word count and its BPE token
    count after ``n_merges`` rounds (the real token budget a trained
    tokenizer would charge, vs the whitespace proxy in functions/text).

    Self-contained twin: trains the segment table inline and encodes
    with it — row-identical to ``bpe_encode_with_segments`` over a
    stored :func:`bpe_segment_table` artifact (pinned in pytest).
    """
    return bpe_encode_with_segments(
        docs,
        bpe_segment_table(docs, n_merges=n_merges, text_col=text_col),
        text_col=text_col,
        id_col=id_col,
    )
