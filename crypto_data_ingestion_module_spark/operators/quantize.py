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
