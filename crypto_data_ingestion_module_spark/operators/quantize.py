"""Embedding quantization: the storage face of the similarity stack.

At 100 TB an `array<float>` embedding column is often the single
largest column in the lake; symmetric int8 quantization cuts it 4×
(and the shuffle volume of every downstream ANN/near-dup join with it)
at a bounded reconstruction error of ``scale/2`` per element.  This is
the standard scalar-quantization storage layout (per-vector absmax
scale + int codes) used by vector stores; the IVF/LSH operators in
``operators.similarity`` consume dequantized vectors unchanged.

Plan shape: pure per-row higher-order-function expressions — map-only,
no shuffle, whole-stage codegen, oracle-checkable (round-half-away and
IEEE double division agree bit-for-bit across engines).

Reference parity: no embedding surface in the reference (SURVEY §2.10
X3/X5 capability extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _absmax(vec_col: str) -> Column:
    return F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric quantization to ``bits``-bit signed codes.

    Returns ``(id_col, scale, qvec)``: ``scale = absmax / (2^(bits-1)-1)``
    (the dequantization factor) and ``qvec[i] = round(x[i] / scale)`` as
    ints in ``[-(2^(bits-1)-1), 2^(bits-1)-1]``; all-zero vectors get
    scale 0 and zero codes.
    """
    levels = float(2 ** (bits - 1) - 1)
    m = _absmax(vec_col)
    scale = F.when(m > 0, m / levels).otherwise(F.lit(0.0))
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            m > 0, F.round(x.cast("double") / (m / levels)).cast("int")
        ).otherwise(F.lit(0)),
    )
    return df.select(
        F.col(id_col), scale.alias("scale"), q.alias("qvec")
    )


def dequantize(qvec: Column | str, scale: Column | str) -> Column:
    """``array<double>`` reconstruction: ``qvec[i] * scale``."""
    s = F.col(scale) if isinstance(scale, str) else scale
    v = F.col(qvec) if isinstance(qvec, str) else qvec
    return F.transform(v, lambda q: q.cast("double") * s)


def _qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two code arrays (LONG — 64×127² per
    element pair is far inside the range)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _quantized_topk_kernel(
    corpus_q: DataFrame, queries_q: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Closure-matrix execution of :func:`quantized_cosine_topk` — the
    same shape as ``similarity._cosine_topk_kernel``: the (bounded)
    quantized query set rides in the kernel closure, the corpus codes
    stream through ONE Arrow pass, each batch scores all its rows as a
    single matmul and emits per-query partial top-k (lossless for the
    global top-k).  All intermediates are exact integers (code products
    ≤ 127²·dim ≪ 2^53, exact in float64 BLAS regardless of order), so
    results are bit-identical to the interpreted lambda twin and the SQL
    oracle."""
    from pyspark.sql import Window

    import numpy as np
    import pandas as pd

    qpd = (
        queries_q.filter(F.col("scale") > 0)
        .select(F.col(id_col).cast("long").alias("qid"), "qvec")
        .toPandas()
    )
    empty_schema = "qid long, nid long, rank int, qcosine double"
    if len(qpd) == 0:
        return corpus_q.sparkSession.createDataFrame([], empty_schema)
    qids = qpd["qid"].to_numpy().astype(np.int64)
    Q = np.vstack(qpd["qvec"].to_numpy()).astype(np.float64)
    qnorm = np.sqrt((Q * Q).sum(axis=1))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["nid"].to_numpy().astype(np.int64)
            M = np.vstack(pdf["qvec"].to_numpy()).astype(np.float64)
            nnorm = np.sqrt((M * M).sum(axis=1))
            C = (M @ Q.T) / (qnorm[None, :] * nnorm[:, None])
            out_q, out_n, out_c = [], [], []
            kk = min(k, len(ids))
            for j in range(len(qids)):
                keep = ids != qids[j]
                cj, ij = C[keep, j], ids[keep]
                if len(ij) == 0:
                    continue
                top = np.lexsort((ij, -cj))[:kk]
                out_q.append(np.full(len(top), qids[j], dtype=np.int64))
                out_n.append(ij[top])
                out_c.append(cj[top])
            if out_q:
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "nid": np.concatenate(out_n),
                        "qcosine": np.concatenate(out_c),
                    }
                )

    cand = (
        corpus_q.filter(F.col("scale") > 0)
        .select(F.col(id_col).cast("long").alias("nid"), "qvec")
        .mapInPandas(kernel, "qid long, nid long, qcosine double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qcosine"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "qcosine")
    )


def quantized_cosine_topk(
    corpus_q: DataFrame,
    queries_q: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vectorized: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k over QUANTIZED vectors.

    Takes two ``quantize_embeddings`` outputs and returns ``(qid, nid,
    rank, qcosine)``.  The per-vector scales CANCEL in the cosine
    (``(qa·qb·sa·sb) / (|qa|sa · |qb|sb)``), so the whole similarity is
    integer dot products plus one final double division — bit-exact
    across engines and partitionings with no fixed-point machinery,
    which is the determinism the float path needs ``FP_SCALE`` tricks
    for.  Zero vectors (scale 0) are excluded from both sides.

    Same physical shape as ``similarity.cosine_topk``: the corpus is
    scanned once and never shuffled, and each scanned row is 4× smaller
    than the float path's.  ``vectorized=True`` (default) runs the scan
    as the closure-matrix Arrow kernel (``_quantized_topk_kernel``,
    bit-identical — parity pinned in tests); False keeps the interpreted
    broadcast-crossJoin twin the SQL oracle mirrors.
    """
    from pyspark.sql import Window

    if vectorized:
        return _quantized_topk_kernel(corpus_q, queries_q, k, id_col)

    q = (
        queries_q.filter(F.col("scale") > 0)
        .select(F.col(id_col).alias("qid"), F.col("qvec").alias("qa"))
        .withColumn("qnorm", F.sqrt(_qdot(F.col("qa"), F.col("qa")).cast("double")))
    )
    c = (
        corpus_q.filter(F.col("scale") > 0)
        .select(F.col(id_col).alias("nid"), F.col("qvec").alias("qb"))
        .withColumn("nnorm", F.sqrt(_qdot(F.col("qb"), F.col("qb")).cast("double")))
    )
    sim = _qdot(F.col("qa"), F.col("qb")).cast("double") / (
        F.col("qnorm") * F.col("nnorm")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qcosine"), F.asc("nid"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("qcosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "qcosine")
    )
