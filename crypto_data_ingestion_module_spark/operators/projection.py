"""Seeded Rademacher random projection (Johnson–Lindenstrauss).

Dimensionality reduction for the similarity stack: project d-dim
embeddings to ``out_dim`` with a ±1 (Rademacher) matrix — the JL
flavor whose projections need no Gaussian sampling, just signs, and
(Achlioptas 2001) preserves pairwise distances within 1±ε for
out_dim = O(log n / ε²) exactly like the Gaussian matrix.

Seeded-everything discipline (the repo's universal oracle-checkable
trainer init): sign(i, j) = parity of the first md5 hex nibble of
``"{i}:{j}:{seed}"`` — the identical construction as the LSH planes in
operators/similarity.py, recomputable in SQL by either engine.  Inputs
are micro-rounded to exact integer units first (``round(x*1e6)``, the
``dsum`` policy), so each output coordinate is an exact integer sum —
bit-identical across engines and aggregation orders.

100 TB shape: map-only (one projection per row, no shuffle, whole-stage
codegen — zip_with/aggregate over sign-array literals); the sign matrix
is out_dim × d literals built ONCE per plan (1024 nodes at 64→16 —
far below the CreateArray plan-cost cliff measured in operators/
bloom.py, which starts mattering around ~10k nodes).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rademacher_sign(i: int, j: int, seed: int) -> int:
    """+1/-1 from the md5 parity of "i:j:seed" — matches the SQL
    ``('0x' || substr(md5(i||':'||j||':'||seed), 1, 1)) % 2`` idiom."""
    nibble = int(hashlib.md5(f"{i}:{j}:{seed}".encode()).hexdigest()[0], 16)
    return 1 if nibble % 2 == 0 else -1


def _project_dim(vec_micro: Column, d: int, j: int, seed: int) -> Column:
    signs = F.array(
        *[F.lit(rademacher_sign(i, j, seed)).cast("long") for i in range(d)]
    )
    return F.aggregate(
        F.zip_with(vec_micro, signs, lambda x, s: x * s),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def rademacher_project(
    df: DataFrame,
    d: int,
    out_dim: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, proj_csv) — ``out_dim`` exact-integer micro-unit coordinates
    as a CSV string (array stringification differs across engines in
    the compare harness; a CSV of integers is exact in both, same trick
    as quantize_embeddings)."""
    micro = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1e6).cast("long")
    )
    tmp = df.select(F.col(id_col), micro.alias("_m"))
    cols = [
        _project_dim(F.col("_m"), d, j, seed).alias(f"p{j}")
        for j in range(out_dim)
    ]
    out = tmp.select(id_col, *cols)
    return out.select(
        id_col,
        F.concat_ws(",", *[F.col(f"p{j}").cast("string") for j in range(out_dim)]).alias(
            "proj_csv"
        ),
    )
