"""Round-3 curation queries: benchmark decontamination and corpus-mixture
composition (SURVEY §2.10 capability extensions, X1/X4 adjacent).

Registered into the same oracle-checked registry as everything else and
verified by pytest (tests/test_queries_oracle.py) against DuckDB; they
sit OUTSIDE the driver's 50-query ``CHECKED_QUERIES`` window, which is
frozen to preserve round-over-round correctness signal.

Imported at the bottom of ``plans.queries`` (registration side effect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.plans.queries import (
    QUERY_SPECS,
    QuerySpec,
    _register,
    _t,
    osum,
)

# --------------------------------------------------------------------------
# Benchmark decontamination (n-gram collision audit)
# --------------------------------------------------------------------------
#
# The held-out "benchmark" is the doc_id % 97 == 0 slice of the documents
# table; the remaining rows are the training corpus.  4-grams (not 13)
# because the synthetic docs are short; the operator's n is free.

def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.decontam import (
        contamination_flags,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_flags(train, bench, n=4)


_register(
    QuerySpec(
        name="decontaminate_docs",
        survey_ids=("X1", "X4"),
        description="benchmark decontamination audit: per-training-doc "
        "count of distinct word 4-grams colliding with the held-out "
        "doc_id%97==0 eval slice (GPT-3/Pile n-gram-collision method; "
        "broadcast benchmark shingles, corpus read once)",
        spark=_decontaminate,
        oracle="""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ws FROM documents
),
sh AS (
  SELECT doc_id AS id, unnest(list_distinct(
    CASE WHEN len(ws) >= 4
         THEN list_transform(range(1, len(ws) - 2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
         ELSE [array_to_string(ws, ' ')] END)) AS shingle
  FROM w
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 97 = 0),
train AS (SELECT id, shingle FROM sh WHERE id % 97 <> 0)
SELECT t.id AS doc_id,
       count(*) AS n_shingles,
       count(b.shingle) AS n_hits,
       count(b.shingle) >= 1 AS contaminated
FROM train t LEFT JOIN bench b ON t.shingle = b.shingle
GROUP BY t.id
""",
    )
)


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination (same family, different physical path)
# --------------------------------------------------------------------------
#
# Same benchmark split; 3-grams with min_common=2 so the answer surface is
# distinct from decontaminate_docs.  The Spark side routes through the
# broadcast Bloom bitset (operators/bloom.py): corpus shingles are
# membership-tested by a pure-JVM codegen expression BEFORE the exact
# confirm join, so at 100 TB ~(1 - FPR) of the corpus-side join probe
# disappears inside the scan stage.  Bloom filters have no false
# negatives and survivors are exactly re-verified, so the result is
# row-for-row the plain SQL answer — which is precisely what this
# oracle pins.

def _decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.decontam import (
        contamination_flags_bloom,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_flags_bloom(train, bench, n=3, min_common=2)


_register(
    QuerySpec(
        name="decontaminate_docs_bloom",
        survey_ids=("X1", "X4"),
        description="Bloom-prefiltered benchmark decontamination: corpus "
        "3-gram shingles are tested against a broadcast 128Ki-bit Bloom "
        "bitset (pure-JVM codegen expression, no false negatives) before "
        "the exact confirm join; flags docs sharing >=2 distinct 3-grams "
        "with the doc_id%97==0 eval slice — answer identical to the "
        "exact semi-join by construction",
        spark=_decontaminate_bloom,
        oracle="""
WITH w AS (
  SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9]+') AS ws FROM documents
),
sh AS (
  SELECT doc_id AS id, unnest(list_distinct(
    CASE WHEN len(ws) >= 3
         THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         ELSE [array_to_string(ws, ' ')] END)) AS shingle
  FROM w
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 97 = 0),
train AS (SELECT id, shingle FROM sh WHERE id % 97 <> 0)
SELECT t.id AS doc_id,
       count(*) AS n_shingles,
       count(b.shingle) AS n_hits,
       count(b.shingle) >= 2 AS contaminated
FROM train t LEFT JOIN bench b ON t.shingle = b.shingle
GROUP BY t.id
""",
    )
)


# --------------------------------------------------------------------------
# Corpus-mixture composition (per-source absolute caps)
# --------------------------------------------------------------------------

_MIX_CAPS = {"src0": 40, "src3": 20, "src7": 10, "src12": 5}


def _corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.sampling import (
        mixture_sample,
    )

    d = _t(spark, sf_dir, "documents")
    return mixture_sample(d, "source", _MIX_CAPS, id_col="doc_id").select(
        "doc_id", "source", "lang", "sample_rank"
    )


# --------------------------------------------------------------------------
# Embedding quantization (int8 storage path)
# --------------------------------------------------------------------------

def _quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.quantize import (
        quantize_embeddings,
    )

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    # arrays stringify differently across engines in the compare
    # harness; a CSV of int codes is exact in both
    return q.select(
        "vec_id", "scale", F.array_join("qvec", ",").alias("qcsv")
    )


_register(
    QuerySpec(
        name="quantize_embeddings",
        survey_ids=("X3", "X5"),
        description="symmetric int8 embedding quantization: per-vector "
        "absmax/127 scale + rounded codes (map-only, shuffle-free; 4x "
        "storage cut for the similarity stack)",
        spark=_quantize,
        oracle="""
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS am
  FROM embeddings
)
SELECT vec_id,
       CASE WHEN am > 0 THEN am / 127.0 ELSE 0.0 END AS scale,
       array_to_string(list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) /
                   (CASE WHEN am > 0 THEN am ELSE 1.0 END / 127.0)) AS INTEGER)
              * CAST(am > 0 AS INTEGER)), ',') AS qcsv
FROM m
""",
    )
)


# --------------------------------------------------------------------------
# Embedding outliers (distance-to-own-centroid curation signal)
# --------------------------------------------------------------------------
#
# The "semantic outlier" filter of an embedding-aware curation pipeline:
# vectors far from their own label's centroid are mislabeled/noise
# candidates.  Rank-based (bottom 10 per label), not thresholded — a
# threshold needs tuning per corpus, a rank is always well-defined.  All
# sums go through the 1e12 fixed-point policy so centroid, norms, and
# dot products are bit-identical across engines and aggregation orders.
# Shape: posexplode → centroid hash-agg → (label,pos) equi-join back →
# per-vector hash-agg → WindowGroupLimit bottom-k per label.  At scale
# the centroid table is tiny (labels × dims) and broadcasts.

_FPS = (
    "CAST(SUM(CAST(round(({x}) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"
)

# Pre-rounded-element fixed-point DOT (operators.similarity._dot_fp):
# elements quantized to 1e-6, exact integer products in 1e-12 units —
# the matmul-able form the similarity kernels and their oracles share.
_FPD = (
    "CAST(SUM(CAST(round(({a}) * 1e6) * round(({b}) * 1e6)"
    " AS DECIMAL(38,0))) AS DOUBLE) / 1e12"
)


def _fps(c):  # Spark twin of _FPS
    # pico-unit exact sum on the split-long fast path (functions.exactsum:
    # same integer total as the DECIMAL(38,0)-per-row form, ~5x faster)
    from crypto_data_ingestion_module_spark.functions.exactsum import fsum

    return fsum(c, 1e12)


def _embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    cen = ex.groupBy("label", "pos").agg(
        (_fps(F.col("x")) / F.count(F.lit(1)).cast("double")).alias("c")
    )
    cnorm = cen.groupBy("label").agg(
        F.sqrt(_fps(F.col("c") * F.col("c"))).alias("cnorm")
    )
    per_vec = (
        ex.join(F.broadcast(cen), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            _fps(F.col("x") * F.col("c")).alias("dot"),
            F.sqrt(_fps(F.col("x") * F.col("x"))).alias("vnorm"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.asc("centroid_cos"), F.asc("vec_id")
    )
    return (
        per_vec.join(F.broadcast(cnorm), "label")
        .withColumn(
            "centroid_cos", F.col("dot") / (F.col("vnorm") * F.col("cnorm"))
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("label", "vec_id", "centroid_cos", "rank")
    )


_register(
    QuerySpec(
        name="embedding_outliers",
        survey_ids=("X3", "X5"),
        description="semantic outliers: bottom-10 vectors per label by "
        "cosine to their own label centroid (mislabel/noise candidates; "
        "fixed-point sums end-to-end)",
        spark=_embedding_outliers,
        oracle=f"""
WITH ex AS (
  SELECT vec_id, label,
         unnest(range(1, len(embedding) + 1)) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cen AS (
  SELECT label, pos, {_FPS.format(x='x')} / CAST(count(*) AS DOUBLE) AS c
  FROM ex GROUP BY label, pos
),
cnorm AS (
  SELECT label, sqrt({_FPS.format(x='c * c')}) AS cnorm FROM cen GROUP BY label
),
per_vec AS (
  SELECT vec_id, ex.label,
         {_FPS.format(x='x * c')} AS dot,
         sqrt({_FPS.format(x='x * x')}) AS vnorm
  FROM ex JOIN cen ON ex.label = cen.label AND ex.pos = cen.pos
  GROUP BY vec_id, ex.label
),
scored AS (
  SELECT p.label, vec_id, dot / (vnorm * cnorm) AS centroid_cos
  FROM per_vec p JOIN cnorm n ON p.label = n.label
)
SELECT label, vec_id, centroid_cos, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY label ORDER BY centroid_cos ASC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""",
    )
)


# --------------------------------------------------------------------------
# Per-document keyword extraction (rarity-weighted top terms)
# --------------------------------------------------------------------------
#
# Score is tf/df, NOT tf·ln(N/df): ln differs in final ulps between
# engines, which would flip ranks of near-equal scores and break the
# hash compare.  tf and df are small exact ints, so the single IEEE
# double division is bit-identical everywhere; ordering is the point of
# a keyword score and tf/df orders sensibly (frequent-in-doc,
# rare-in-corpus wins).  Shape: explode → two hash aggs (map-side
# combined) → equi-join on term → WindowGroupLimit top-3 per doc.

def _doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from crypto_data_ingestion_module_spark.functions.text import words

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(words(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(dft, "term")
        .withColumn("score", F.col("tf").cast("double") / F.col("df").cast("double"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


_register(
    QuerySpec(
        name="doc_keywords",
        survey_ids=("X4",),
        description="top-3 keywords per document by tf/df rarity score "
        "(exact-int inputs, one deterministic double division; no ln, "
        "whose engine-dependent ulps would flip ranks)",
        spark=_doc_keywords,
        oracle="""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
  FROM tf JOIN dft USING (term)
)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= 3
""",
    )
)


# --------------------------------------------------------------------------
# Per-source corpus report (curation monitoring)
# --------------------------------------------------------------------------
#
# The daily dashboard of a corpus pipeline: per ingestion source, volume,
# exact-dup rate, mean quality, language mix.  Mean quality goes through
# the micro-unit fixed-point sum (order-independent) divided by an exact
# count — deterministic across engines.

def _corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.functions import text as TX
    from crypto_data_ingestion_module_spark.plans.queries import dsum

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_text"),
        (dsum(TX.quality_score("text")) / F.count(F.lit(1)).cast("double")).alias(
            "mean_quality"
        ),
        F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
        F.sum(F.col("n_chars")).alias("total_chars"),
    )


def _corpus_report_oracle() -> str:
    from crypto_data_ingestion_module_spark.functions import text as TX

    q = TX.oracle_quality_sql("text")
    return f"""
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT text) AS n_distinct_text,
       (CAST(SUM(CAST(round(({q}) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0)
         / CAST(count(*) AS DOUBLE) AS mean_quality,
       count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
"""


_register(
    QuerySpec(
        name="corpus_report",
        survey_ids=("X4", "A2"),
        description="per-source curation dashboard: volume, exact-dup "
        "rate, fixed-point mean quality, language mix, char volume",
        spark=_corpus_report,
        oracle=_corpus_report_oracle(),
    )
)


# --------------------------------------------------------------------------
# Daily-volume anomaly detection (monitoring the ingest stream)
# --------------------------------------------------------------------------
#
# Per event type: aggregate exact daily value totals, then flag days
# whose total deviates from the type's mean by more than 2 population
# standard deviations.  Everything that feeds the flag is deterministic:
# daily totals are fixed-point sums; mean and E[x²] are fixed-point sums
# of those exact values over an exact count; std = sqrt(E[x²] − mean²)
# and the z-score are single IEEE ops.  Two hash aggregates + a
# broadcast join of the per-type stats — no window over raw events.

def _daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.plans.queries import dsum

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(dsum(F.col("value")).alias("day_value"))
    stats = daily.groupBy("event_type").agg(
        (dsum(F.col("day_value")) / F.count(F.lit(1)).cast("double")).alias("mean_v"),
        (
            dsum(F.col("day_value") * F.col("day_value"))
            / F.count(F.lit(1)).cast("double")
        ).alias("ex2"),
    ).withColumn("std_v", F.sqrt(F.col("ex2") - F.col("mean_v") * F.col("mean_v")))
    # Degenerate strata (one day, or constant daily totals) have std 0:
    # Spark's double division yields NULL there while DuckDB's IEEE
    # division yields inf/nan, so the z-score is guarded to 0.0 (and the
    # flag to false) in BOTH engines.  The guard also absorbs a NaN std
    # from sqrt of a tiny negative E[x²]−mean² (NaN > 0 is false in both).
    return (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn(
            "z",
            F.when(
                F.col("std_v") > 0,
                (F.col("day_value") - F.col("mean_v")) / F.col("std_v"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("is_anomaly", F.abs(F.col("z")) > 2.0)
        .select("event_type", "day", "day_value", "z", "is_anomaly")
    )


_FP6 = "CAST(SUM(CAST(round(({x}) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0"

_register(
    QuerySpec(
        name="daily_volume_anomalies",
        survey_ids=("A2", "D5"),
        description="per-type daily value totals flagged at |z| > 2 vs "
        "the type's mean/std — ingest monitoring; fixed-point sums make "
        "mean, std, and the flag deterministic",
        spark=_daily_anomalies,
        oracle=f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         {_FP6.format(x='value')} AS day_value
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
),
stats AS (
  SELECT event_type,
         {_FP6.format(x='day_value')} / CAST(count(*) AS DOUBLE) AS mean_v,
         {_FP6.format(x='day_value * day_value')} / CAST(count(*) AS DOUBLE) AS ex2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.day_value,
       CASE WHEN sqrt(s.ex2 - s.mean_v * s.mean_v) > 0
            THEN (d.day_value - s.mean_v) / sqrt(s.ex2 - s.mean_v * s.mean_v)
            ELSE 0.0 END AS z,
       abs(CASE WHEN sqrt(s.ex2 - s.mean_v * s.mean_v) > 0
                THEN (d.day_value - s.mean_v) / sqrt(s.ex2 - s.mean_v * s.mean_v)
                ELSE 0.0 END) > 2.0 AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
""",
    )
)


# --------------------------------------------------------------------------
# Oracle-checkable LSH ANN (md5-seeded Rademacher planes)
# --------------------------------------------------------------------------

# 16 tables × 4 sign bits — the same operating point as the numpy
# variant's pinned-recall config (few planes + many tables suits this
# corpus' wide neighbor angles; measured recall 0.88 vs brute force)
_LSH_T, _LSH_P = 16, 4


def _ann_lsh_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.similarity import (
        ann_lsh_seed_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ann_lsh_seed_topk(
        emb, queries, k=10, n_planes=_LSH_P, n_tables=_LSH_T, dim=64
    )


_register(
    QuerySpec(
        name="ann_lsh_seed_topk",
        survey_ids=("X3",),
        description="approximate top-10 via md5-seeded Rademacher LSH "
        f"({_LSH_T} tables x {_LSH_P} sign bits): planes, buckets, "
        "candidate join, and fixed-point rerank are all relational, so "
        "the oracle hash-checks the whole index (the numpy-hyperplane "
        "variant keeps its recall pytest as the throughput path)",
        spark=_ann_lsh_seed,
        oracle=f"""
WITH planes AS (
  SELECT t, p, d,
         CASE WHEN ('0x' || substr(md5(t || ':' || p || ':' || d), 1, 1))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM range({_LSH_T}) r1(t), range({_LSH_P}) r2(p), range(64) r3(d)
),
c AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
cx AS (SELECT nid, unnest(range(0, len(nv))) AS d, CAST(unnest(nv) AS DOUBLE) AS x FROM c),
qx AS (SELECT qid, unnest(range(0, len(qv))) AS d, CAST(unnest(qv) AS DOUBLE) AS x FROM q),
cproj AS (
  SELECT nid, t, p, SUM(round(x * 1e12) * s) AS pr
  FROM cx JOIN planes USING (d) GROUP BY nid, t, p
),
qproj AS (
  SELECT qid, t, p, SUM(round(x * 1e12) * s) AS pr
  FROM qx JOIN planes USING (d) GROUP BY qid, t, p
),
cbuck AS (
  SELECT nid, t AS tbl,
         SUM(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS bucket
  FROM cproj GROUP BY nid, t
),
qbuck AS (
  SELECT qid, t AS tbl,
         SUM(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS bucket
  FROM qproj GROUP BY qid, t
),
cand AS (
  SELECT DISTINCT qb.qid, cb.nid
  FROM qbuck qb JOIN cbuck cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
  WHERE qb.qid <> cb.nid
),
cn AS (SELECT nid, sqrt({_FPD.format(a='x', b='x')}) AS nnorm FROM cx GROUP BY nid),
qn AS (SELECT qid, sqrt({_FPD.format(a='x', b='x')}) AS qnorm FROM qx GROUP BY qid),
dots AS (
  SELECT qid, nid, {_FPD.format(a='xq', b='xn')} AS dot
  FROM (SELECT cand.qid, cand.nid,
               CAST(unnest(q.qv) AS DOUBLE) AS xq,
               CAST(unnest(c.nv) AS DOUBLE) AS xn
        FROM cand JOIN q ON q.qid = cand.qid JOIN c ON c.nid = cand.nid)
  GROUP BY qid, nid
),
ranked AS (
  SELECT d.qid, d.nid, d.dot / (qn.qnorm * cn.nnorm) AS cosine,
         row_number() OVER (PARTITION BY d.qid
                            ORDER BY d.dot / (qn.qnorm * cn.nnorm) DESC, d.nid) AS rank
  FROM dots d JOIN qn ON d.qid = qn.qid JOIN cn ON d.nid = cn.nid
)
SELECT qid, nid, CAST(rank AS INT) AS rank, cosine FROM ranked WHERE rank <= 10
""",
    )
)


# --------------------------------------------------------------------------
# Quantized cosine top-k (integer-dot search over int8 codes)
# --------------------------------------------------------------------------

def _quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.quantize import (
        quantize_embeddings,
        quantized_cosine_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus_q = quantize_embeddings(emb)
    queries_q = quantize_embeddings(emb.filter(F.col("vec_id") % 100 == 0))
    return quantized_cosine_topk(corpus_q, queries_q, k=10)


_register(
    QuerySpec(
        name="cosine_topk_quantized",
        survey_ids=("X3",),
        description="cosine top-10 over int8-quantized vectors: scales "
        "cancel, so similarity is exact integer dot products + one double "
        "division — deterministic with no fixed-point tricks, 4x less "
        "scanned data than the float path",
        spark=_quantized_topk,
        oracle="""
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS am
  FROM embeddings
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) /
                     (CASE WHEN am > 0 THEN am ELSE 1.0 END / 127.0)) AS BIGINT)
                * CAST(am > 0 AS BIGINT)) AS qv
  FROM m WHERE am > 0
),
n AS (
  SELECT vec_id, qv,
         sqrt(CAST((SELECT CAST(sum(x * x) AS BIGINT)
                    FROM unnest(qv) AS t(x)) AS DOUBLE)) AS nrm
  FROM q
),
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         CAST((SELECT CAST(sum(xa * xb) AS BIGINT)
               FROM (SELECT unnest(a.qv) AS xa, unnest(b.qv) AS xb)) AS DOUBLE)
           / (a.nrm * b.nrm) AS qcosine
  FROM n a JOIN n b ON a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT qid, nid, qcosine,
         row_number() OVER (PARTITION BY qid ORDER BY qcosine DESC, nid ASC) AS rank
  FROM dots
)
SELECT qid, nid, rank, qcosine FROM ranked WHERE rank <= 10
""",
    )
)


_MIX_CASE = "CASE source " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_CAPS.items()
) + " END"

_register(
    QuerySpec(
        name="corpus_mixture",
        survey_ids=("X4",),
        description="deterministic mixture composition: absolute per-source "
        "caps (40/20/10/5 docs from four sources) via seeded md5 rank — "
        "the data-recipe step of a training pipeline, reproducible across "
        "engines and layouts",
        spark=_corpus_mixture,
        oracle=f"""
WITH ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '#42'), doc_id
         ) AS sample_rank
  FROM documents
  WHERE source IN ({", ".join(repr(k) for k in _MIX_CAPS)})
)
SELECT doc_id, source, lang, sample_rank FROM ranked
WHERE sample_rank <= {_MIX_CASE}
""",
    )
)


# --------------------------------------------------------------------------
# Document rarity: mean inverse document frequency over each doc's
# DISTINCT [a-z]+ terms — the log-free IDF analog (ln is not
# correctly-rounded cross-engine; 1/df is ONE double division of exact
# integers, bit-identical in both engines, then micro-unit fixed-point
# mean).  High rarity = niche vocabulary; the curation signal that
# complements quality_score's surface features.  Plan: distinct
# (doc, term) grain once, df hash-agg, broadcast the vocabulary-sized df
# table back, one per-doc aggregate.
# --------------------------------------------------------------------------

def _doc_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.plans.queries import dsum

    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").rlike("^[a-z]+$"))
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(F.broadcast(dfreq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            (
                dsum(F.lit(1.0) / F.col("df"))
                / F.count(F.lit(1)).cast("double")
            ).alias("rarity"),
        )
    )


_register(
    QuerySpec(
        name="doc_rarity_score",
        survey_ids=("X4",),
        description="mean inverse document frequency over each doc's "
        "distinct terms (log-free IDF: exact-integer division + "
        "fixed-point mean) — the niche-vocabulary curation signal",
        spark=_doc_rarity,
        oracle=f"""
WITH toks AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE regexp_matches(word, '^[a-z]+$')
),
dfreq AS (
  SELECT word, count(*) AS df FROM toks GROUP BY word
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       {osum('1.0 / df')} / count(*) AS rarity
FROM toks JOIN dfreq USING (word)
GROUP BY doc_id
""",
    )
)


# --------------------------------------------------------------------------
# Length-weighted systematic sampling (token-budget mixture draw)
# --------------------------------------------------------------------------

def _pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.sampling import (
        systematic_pps_sample,
    )

    return systematic_pps_sample(
        _t(spark, sf_dir, "documents"), step=5000
    )


_register(
    QuerySpec(
        name="length_weighted_sample",
        survey_ids=("X4",),
        description="systematic PPS draw: one doc per 5000 chars of each "
        "source's cumulative mass — deterministic length-proportional "
        "sampling in exact integer arithmetic (no rng, no pow)",
        spark=_pps_sample,
        oracle="""
WITH c AS (
  SELECT doc_id, source, n_chars,
         SUM(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT doc_id, source, n_chars,
       CAST(cum // 5000 AS BIGINT) AS tick
FROM c
WHERE cum // 5000 > (cum - n_chars) // 5000
""",
    )
)


# --------------------------------------------------------------------------
# X3 retrieval evaluation: recall@10 + reciprocal rank of the seeded-LSH
# ANN against the exact cosine truth, measured IN the engine in exact
# integer ppm.  Both constituents are themselves oracle-paired queries,
# so the composed oracle simply wraps their SQL as subqueries — the
# evaluation pipeline is hash-checked end to end, including the ANN
# index, the exact truth, and the metric math.
# --------------------------------------------------------------------------

def _ann_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.search import (
        retrieval_metrics,
    )

    exact = QUERY_SPECS["cosine_topk"].spark(spark, sf_dir)
    approx = QUERY_SPECS["ann_lsh_seed_topk"].spark(spark, sf_dir)
    return retrieval_metrics(approx, exact, k=10)


_register(
    QuerySpec(
        name="ann_recall_mrr",
        survey_ids=("X3",),
        description="per-query recall@10 + reciprocal rank (exact "
        "integer ppm) of the seeded-LSH ANN vs the exact cosine truth "
        "— distributed retrieval evaluation, composed from two "
        "oracle-paired rankers so the metric itself hash-checks",
        spark=_ann_eval_q,
        oracle=f"""
WITH approx AS (SELECT * FROM ({{APPROX}})),
exact AS (SELECT * FROM ({{EXACT}})),
hits AS (
  SELECT a.qid, a.rank FROM approx a
  JOIN exact e ON a.qid = e.qid AND a.nid = e.nid
),
per AS (
  SELECT qid, count(*) AS n_hits, min(rank) AS first_hit
  FROM hits GROUP BY qid
)
SELECT q.qid,
       CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(1000000 * COALESCE(p.n_hits, 0) // 10 AS BIGINT) AS recall_ppm,
       CAST(COALESCE(1000000 // p.first_hit, 0) AS BIGINT) AS rr_ppm
FROM (SELECT DISTINCT qid FROM exact) q
LEFT JOIN per p ON q.qid = p.qid
""".replace("{APPROX}", QUERY_SPECS["ann_lsh_seed_topk"].oracle).replace(
            "{EXACT}", QUERY_SPECS["cosine_topk"].oracle
        ),
    )
)


# --------------------------------------------------------------------------
# X3 per-query rank fusion (r12): the PRODUCTION multi-query shape of
# RRF.  hybrid_rrf_topk fuses two rankers for ONE query (global
# window); this row fuses the exact-cosine and seeded-LSH rankers for
# EVERY query vector in a single pass — rrf_fuse_per_query windows
# partitioned by qid, so the plan has no global (single-partition)
# window and the shuffle key is the query id.  Composed from the two
# PAIRED rankers, so both indexes and the fusion hash-check in one row
# (the ann_recall_mrr move applied to serving instead of eval).
# 100 TB shape: one shuffle on qid; per-query work bounded by the two
# top-k lists — query count scales out, corpus size never enters the
# fusion.
# --------------------------------------------------------------------------

def _rrf_per_query_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.search import (
        rrf_fuse_per_query,
    )

    dense = QUERY_SPECS["cosine_topk"].spark(spark, sf_dir)
    approx = QUERY_SPECS["ann_lsh_seed_topk"].spark(spark, sf_dir)
    return rrf_fuse_per_query(dense, approx, query_col="qid", id_col="nid")


_register(
    QuerySpec(
        name="hybrid_rrf_per_query",
        survey_ids=("X3",),
        description="per-query reciprocal-rank fusion (exact integer "
        "ppm) of the exact-cosine and seeded-LSH rankers over every "
        "query vector — the partitioned production shape of RRF, "
        "composed from two oracle-paired rankers",
        spark=_rrf_per_query_q,
        oracle="""
WITH a AS (SELECT qid, nid, rank AS ra FROM ({DENSE})),
b AS (SELECT qid, nid, rank AS rb FROM ({APPROX})),
fused AS (
  SELECT COALESCE(a.qid, b.qid) AS qid,
         COALESCE(a.nid, b.nid) AS nid,
         COALESCE(1000000 // (60 + a.ra), 0)
           + COALESCE(1000000 // (60 + b.rb), 0) AS rrf_ppm
  FROM a FULL JOIN b ON a.qid = b.qid AND a.nid = b.nid
)
SELECT qid, nid, CAST(rrf_ppm AS BIGINT) AS rrf_ppm, CAST(rank AS INT) AS rank
FROM (
  SELECT qid, nid, rrf_ppm,
         row_number() OVER (PARTITION BY qid ORDER BY rrf_ppm DESC, nid)
           AS rank
  FROM fused
) WHERE rank <= 10
""".replace("{DENSE}", QUERY_SPECS["cosine_topk"].oracle).replace(
            "{APPROX}", QUERY_SPECS["ann_lsh_seed_topk"].oracle
        ),
    )
)


# --------------------------------------------------------------------------
# X2 dedup-sketch evaluation: precision/recall of the banded MinHash LSH
# pair set against exact n-gram Jaccard truth, the dedup twin of
# ann_recall_mrr — again composed from two oracle-paired queries so the
# sketch, the truth, and the metric hash-check in one row.
# --------------------------------------------------------------------------

def _lsh_pair_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        pair_set_metrics,
    )

    cand = QUERY_SPECS["minhash_lsh_pairs_md5"].spark(spark, sf_dir)
    truth = QUERY_SPECS["ngram_jaccard_pairs"].spark(spark, sf_dir)
    return pair_set_metrics(cand, truth)


_register(
    QuerySpec(
        name="lsh_pair_recall",
        survey_ids=("X2",),
        description="precision/recall (exact integer ppm) of the banded "
        "md5-MinHash LSH candidate pairs vs exact word-4-gram Jaccard "
        "truth — in-engine dedup-sketch evaluation composed from two "
        "oracle-paired pair generators",
        spark=_lsh_pair_eval_q,
        oracle=f"""
WITH cand AS (SELECT DISTINCT id_a AS a, id_b AS b FROM ({{CAND}})),
truth AS (SELECT DISTINCT id_a AS a, id_b AS b FROM ({{TRUTH}})),
common AS (SELECT c.a, c.b FROM cand c JOIN truth t ON c.a = t.a AND c.b = t.b),
s AS (
  SELECT (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM cand) AS n_candidates,
         (SELECT count(*) FROM common) AS n_common
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(CASE WHEN n_truth > 0 THEN 1000000 * n_common // n_truth
                 ELSE 0 END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_candidates > 0 THEN 1000000 * n_common // n_candidates
                 ELSE 0 END AS BIGINT) AS precision_ppm
FROM s
""".replace("{CAND}", QUERY_SPECS["minhash_lsh_pairs_md5"].oracle).replace(
            "{TRUTH}", QUERY_SPECS["ngram_jaccard_pairs"].oracle
        ),
    )
)


# --------------------------------------------------------------------------
# X2/X3 SemDeDup prune evaluation: recall/precision of the
# cluster-bounded semantic pair generator against exact all-pairs truth
# at the SAME cosine threshold — the honest measurement of what the
# coarse-cluster prune loses (pairs split across cluster boundaries),
# the documented SemDeDup tradeoff quantified in-engine.
# --------------------------------------------------------------------------

def _semdedup_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        pair_set_metrics,
    )

    cand = QUERY_SPECS["semantic_near_dup_pairs"].spark(spark, sf_dir)
    truth = QUERY_SPECS["embedding_near_dup_pairs"].spark(spark, sf_dir)
    return pair_set_metrics(cand, truth)


_register(
    QuerySpec(
        name="semdedup_pair_recall",
        survey_ids=("X2", "X3"),
        description="recall/precision (exact integer ppm) of the "
        "SemDeDup cluster-bounded pair generator vs exact all-pairs "
        "cosine truth at the same 0.42 threshold — quantifies the "
        "cross-cluster pairs the coarse prune loses, in-engine",
        spark=_semdedup_eval_q,
        oracle=f"""
WITH cand AS (SELECT DISTINCT id_a AS a, id_b AS b FROM ({{CAND}})),
truth AS (SELECT DISTINCT id_a AS a, id_b AS b FROM ({{TRUTH}})),
common AS (SELECT c.a, c.b FROM cand c JOIN truth t ON c.a = t.a AND c.b = t.b),
s AS (
  SELECT (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM cand) AS n_candidates,
         (SELECT count(*) FROM common) AS n_common
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(CASE WHEN n_truth > 0 THEN 1000000 * n_common // n_truth
                 ELSE 0 END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN n_candidates > 0 THEN 1000000 * n_common // n_candidates
                 ELSE 0 END AS BIGINT) AS precision_ppm
FROM s
""".replace("{CAND}", QUERY_SPECS["semantic_near_dup_pairs"].oracle).replace(
            "{TRUTH}", QUERY_SPECS["embedding_near_dup_pairs"].oracle
        ),
    )
)


# --------------------------------------------------------------------------
# Graph-based ANN: seeded NN-descent + multi-hop search (r16, VERDICT
# r15 item 3 — the one major ANN paradigm the IVF/PQ/LSH rows left
# uncovered; HNSW-class graph search is the industry default for
# high-recall serving).  Oracle-checkable by the same discipline as
# ann_lsh_seed_topk: md5-seeded randomness, exact fixed-point cosine,
# (cosine desc, id asc) ties, FIXED unrolled iteration count — the
# whole build+search is a finite CTE pipeline DuckDB replays
# bit-for-bit.  Measured recall@10 vs brute force: 1.000 at sf0.001/
# sf0.01 (500 vecs), 0.985 at sf0.1 (2000 vecs) — pinned in
# tests/test_graph_ann.py via retrieval_metrics.
# 100 TB shape: NN-descent candidate volume is n x (2M)^2 — linear in
# corpus size with a constant per-node budget, never all-pairs; two
# shuffles per round (two-hop self-join + top-M window).  Search is
# frontier-bounded per query (E x (M+1)^H), independent of corpus size.
# --------------------------------------------------------------------------

_GANN_M, _GANN_T, _GANN_R = 12, 2, 12
_GANN_E, _GANN_H, _GANN_K = 6, 3, 10


def _ann_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.operators.graph_ann import (
        ann_graph_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()  # dense 0..n-1 ids: the embeddings-table contract
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    # dense ids ⇒ the query count is exact arithmetic, no extra job:
    # ids divisible by 100 in 0..n-1 number ceil(n/100) — declared so
    # the frontier-broadcast gate has a size to reason from (r18)
    return ann_graph_topk(
        emb, queries, n_nodes=n, k=_GANN_K, m=_GANN_M,
        iterations=_GANN_T, r_init=_GANN_R, entries=_GANN_E, hops=_GANN_H,
        n_queries=(n + 99) // 100,
    )


def _ann_graph_oracle() -> str:
    dot = _FPD.format(a="ax.x", b="bx.x")
    nrm = _FPD.format(a="x", b="x")
    seed = (
        "('0x' || substr(md5(nid || ':' || r), 1, 15))::BIGINT"
        " % (SELECT n FROM nn)"
    )
    qseed = (
        "('0x' || substr(md5('q' || qid || ':' || e), 1, 15))::BIGINT"
        " % (SELECT n FROM nn)"
    )

    def score(cand: str, a: str = "src", b: str = "dst") -> str:
        return (
            f"SELECT p.{a}, p.{b}, {dot} AS dot FROM {cand} p "
            f"JOIN cx ax ON ax.nid = p.{a} "
            f"JOIN cx bx ON bx.nid = p.{b} AND bx.d = ax.d "
            f"GROUP BY p.{a}, p.{b}"
        )

    def top_m(s: str) -> str:
        return (
            "SELECT src, dst FROM ("
            "SELECT s.src, s.dst, row_number() OVER (PARTITION BY s.src "
            "ORDER BY s.dot / (na.nrm * nb.nrm) DESC, s.dst) AS rk "
            f"FROM {s} s JOIN norms na ON na.nid = s.src "
            "JOIN norms nb ON nb.nid = s.dst"
            f") WHERE rk <= {_GANN_M}"
        )

    parts = [
        "WITH c AS MATERIALIZED (SELECT vec_id AS nid, embedding AS nv FROM embeddings)",
        "cx AS MATERIALIZED (SELECT nid, unnest(range(0, len(nv))) AS d,"
        " CAST(unnest(nv) AS DOUBLE) AS x FROM c)",
        f"norms AS MATERIALIZED (SELECT nid, sqrt({nrm}) AS nrm FROM cx GROUP BY nid)",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM c)",
        f"cand0 AS MATERIALIZED (SELECT DISTINCT nid AS src, {seed} AS dst"
        f" FROM c, range({_GANN_R}) rr(r) WHERE nid <> {seed})",
        f"s0 AS MATERIALIZED ({score('cand0')})",
        f"g0 AS MATERIALIZED ({top_m('s0')})",
    ]
    for i in range(_GANN_T):
        parts += [
            f"u{i} AS MATERIALIZED (SELECT src, dst FROM g{i}"
            f" UNION SELECT dst, src FROM g{i})",
            f"cand{i + 1} AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
            f"SELECT src, dst FROM u{i} UNION ALL "
            f"SELECT a.src, b.dst FROM u{i} a JOIN u{i} b ON a.dst = b.src"
            f") WHERE src <> dst)",
            f"s{i + 1} AS MATERIALIZED ({score(f'cand{i + 1}')})",
            f"g{i + 1} AS MATERIALIZED ({top_m(f's{i + 1}')})",
        ]
    g = f"g{_GANN_T}"
    parts += [
        "q AS MATERIALIZED (SELECT nid AS qid FROM c WHERE nid % 100 = 0)",
        f"f0 AS MATERIALIZED (SELECT DISTINCT qid, {qseed} AS node"
        f" FROM q, range({_GANN_E}) ee(e))",
    ]
    for h in range(_GANN_H):
        parts.append(
            f"f{h + 1} AS MATERIALIZED (SELECT DISTINCT qid, node FROM ("
            f"SELECT qid, node FROM f{h} UNION ALL "
            f"SELECT f.qid, g.dst AS node FROM f{h} f"
            f" JOIN {g} g ON g.src = f.node))"
        )
    parts += [
        f"fc AS MATERIALIZED (SELECT qid, node AS nid FROM f{_GANN_H} WHERE qid <> node)",
        f"sc AS MATERIALIZED ({score('fc', 'qid', 'nid')})",
        "ranked AS MATERIALIZED (SELECT s.qid, s.nid,"
        " s.dot / (na.nrm * nb.nrm) AS cosine,"
        " row_number() OVER (PARTITION BY s.qid"
        " ORDER BY s.dot / (na.nrm * nb.nrm) DESC, s.nid) AS rank"
        " FROM sc s JOIN norms na ON na.nid = s.qid"
        " JOIN norms nb ON nb.nid = s.nid)",
    ]
    return (
        ",\n".join(parts)
        + f"\nSELECT qid, nid, CAST(rank AS INT) AS rank, cosine"
        f" FROM ranked WHERE rank <= {_GANN_K}"
    )


_register(
    QuerySpec(
        name="ann_graph_topk",
        survey_ids=("X3",),
        description="graph-based ANN: md5-seeded NN-descent kNN graph "
        f"(M={_GANN_M}, {_GANN_T} unrolled rounds) + {_GANN_H}-hop "
        f"seeded search from {_GANN_E} entry points; every stage "
        "relational and fixed-point, so the oracle hash-checks graph "
        "construction AND search end-to-end (recall 0.985 vs brute "
        "force at sf0.1, pinned in pytest)",
        spark=_ann_graph_q,
        oracle=_ann_graph_oracle(),
    )
)
