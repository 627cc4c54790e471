"""Distributed Lloyd's k-means over embedding columns — oracle-checkable.

The engine's ANN/IVF stack (operators/similarity.py) uses a SEEDED
quantizer for checkability and a double-precision k-means for recall; this
module owns the missing piece: the Lloyd ITERATION itself as a pure
DataFrame program, exact enough to hash-match a SQL oracle.  That makes
"train a coarse quantizer / SemDeDup cluster map on the cluster, not the
driver" a first-class, correctness-gated operation instead of a bounded
driver-side trainer.

Exactness policy (same family as plans.queries.dsum):
- Vector elements are micro-rounded once up front
  (``round(CAST(x AS DOUBLE) * 1e6)`` — integer-valued doubles).
- Squared distances fold ``(a-b)^2`` terms (exact doubles <= 1e12) into a
  DECIMAL(38,0) accumulator — exact in any order/engine.
- Centroid updates are per-(cluster, position) DECIMAL sums / counts,
  micro-rounded back to integer-valued doubles, so iteration i+1 starts
  from bit-identical centroids in every engine.
- Ties (equidistant centroids) break toward the smaller cluster id in
  both engines.

Scale shape (100 TB): per iteration, ONE corpus pass for assignment (a
broadcast of k centroids + a fold expression — no shuffle) and one
posexplode aggregation for the update (shuffle carries k x dim partial
sums after map-side combine, not vectors).  Empty clusters drop out, as
in the textbook algorithm.  Initialization is the md5-seeded pick the
IVF stack already uses (k-means|| would add another bounded round; the
seed pick is the oracle-friendly baseline).

The plan doubles per iteration (each level embeds the previous centroid
lineage twice); ``checkpoint=True`` truncates lineage per round for
iters > 2 at the cost of materializing k x dim rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000.0


def _micro(vec: Column) -> Column:
    """array<float> → array<double> of exact micro-unit integers."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * _SCALE))


def _d2_micro2(a: Column, b: Column) -> Column:
    """Exact squared distance in micro^2 units (integer-valued double).

    Each term is an exact double (<= ~1e12); the fold accumulates in
    DECIMAL(38,0) so the total is order- and engine-independent.
    """
    terms = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(
        terms,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + t.cast("decimal(38,0)"),
    ).cast("double")


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    checkpoint: bool = False,
    vectorized: bool = True,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the md5-seeded init; return the
    final assignment ``(vec_id, cluster, dist2)`` for every corpus row.

    ``dist2`` is the exact squared distance to the winning centroid in
    raw units (micro^2 / 1e12 — deterministic division of identical
    integer-valued doubles).

    ``vectorized=True`` (default) runs each assignment pass as a
    closure-matrix Arrow kernel: the round's k x dim centroid matrix
    (bounded by contract, like the IVF trainer) rides in the closure and
    each corpus batch computes ``|x|^2 - 2xC^T + |c|^2`` as one integer
    matmul — every term is an exact float64 integer below 2^53, so the
    minima and argminima are BIT-IDENTICAL to the relational
    decimal-fold twin (``vectorized=False``, the form the SQL oracle
    mirrors; equality pinned in tests).  The kernel path also keeps the
    plan size constant across iterations (centroids leave the lineage),
    where the relational plan doubles per round.
    """
    pts = corpus.select(
        F.col(id_col).alias("nid"), _micro(F.col(vec_col)).alias("xu")
    )

    # init: the k corpus vectors with smallest (md5(id), id) — the same
    # seed rule as operators.similarity._seed_centroids, reused so the
    # IVF stack and this trainer agree on iteration zero.
    seeds = (
        pts.withColumn("_h", F.md5(F.col("nid").cast("string")))
        .orderBy("_h", "nid")
        .limit(k)
    )
    w_seed = Window.orderBy("_h", "nid")
    cent = seeds.select(
        (F.row_number().over(w_seed) - 1).alias("cluster"),
        F.col("xu").alias("cu"),
    )

    assign = _assign_vectorized if vectorized else _assign
    for _ in range(iters):
        assigned = assign(pts, cent)
        cent = _update(assigned)
        if checkpoint and not vectorized:
            cent = cent.localCheckpoint(eager=True)

    final = assign(pts, cent)
    return final.select(
        F.col("nid").alias("vec_id"),
        "cluster",
        (F.col("d2") / F.lit(1e12)).alias("dist2"),
    )


def _assign_vectorized(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """Closure-matrix assignment: one Arrow pass over the corpus, the
    (bounded) centroid matrix in the kernel closure.  ``np.argmin``
    takes the first minimum, which is exactly the (d2 asc, cluster asc)
    tie-break of the relational twin (centroid rows sorted by cluster).
    """
    import numpy as np
    import pandas as pd

    rows = cent.orderBy("cluster").collect()  # k x dim, bounded
    clusters = np.array([r["cluster"] for r in rows], dtype=np.int32)
    C = np.vstack([np.asarray(r["cu"], dtype=np.float64) for r in rows])
    c2 = (C * C).sum(axis=1)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["xu"].to_numpy()).astype(np.float64)
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ C.T)
                + c2[None, :]
            )
            j = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "nid": pdf["nid"].to_numpy(),
                    "cluster": clusters[j],
                    "d2": d2[np.arange(len(j)), j],
                    "xu": pdf["xu"],
                }
            )

    return pts.mapInPandas(
        kernel, "nid long, cluster int, d2 double, xu array<double>"
    )


def _assign(pts: DataFrame, cent: DataFrame) -> DataFrame:
    """One corpus pass: nearest centroid per point (broadcast x fold,
    argmin collapsed map-side via min(struct))."""
    return (
        pts.crossJoin(F.broadcast(cent))
        .select(
            "nid",
            "xu",
            "cluster",
            _d2_micro2(F.col("xu"), F.col("cu")).alias("d2"),
        )
        .groupBy("nid")
        .agg(
            F.min(
                F.struct(F.col("d2").alias("d"), F.col("cluster").alias("c"))
            ).alias("_a"),
            F.first("xu").alias("xu"),
        )
        .select(
            "nid",
            F.col("_a.c").alias("cluster"),
            F.col("_a.d").alias("d2"),
            "xu",
        )
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, position) exact mean, micro-rounded.
    Shuffle grain is k x dim partials (map-side combined), never rows."""
    el = assigned.select(
        "cluster", F.posexplode(F.col("xu")).alias("pos", "v")
    )
    # v is an exact micro-unit integer (|v| ≲ 1e6): sum on the split-long
    # fast path (functions.exactsum) — same integer total as the
    # DECIMAL(38,0)-per-row form, limb headroom ≥ 2^43 rows per cluster
    from crypto_data_ingestion_module_spark.functions.exactsum import (
        lsum_dec,
    )

    means = el.groupBy("cluster", "pos").agg(
        F.round(
            lsum_dec(F.col("v").cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return (
        means.groupBy("cluster")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("_a")
        )
        .select(
            "cluster", F.transform(F.col("_a"), lambda s: s["m"]).alias("cu")
        )
    )
