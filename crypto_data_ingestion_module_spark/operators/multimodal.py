"""Multimodal column plumbing (north-star X5): opaque binary payloads with
typed metadata, processed by Arrow-batched Pandas UDFs via ``mapInPandas``.

The decode kernels themselves are STUBBED (this container has no
image/audio libraries — see ``decode_image_batch``); everything around
them is real and tested: schema, batch iteration, partitioning, UDF
signatures, output shapes.  Swapping the stub for PIL/ffmpeg is a
one-function change.

Scale design: ``mapInPandas`` streams Arrow record batches, so executor
memory is bounded by batch size, not partition size; payload bytes stay
off the driver entirely.  Repartition by ``asset_id`` before heavy decode
so work spreads evenly; feature outputs are small fixed-size arrays,
shrinking data volume through the pipeline.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Set True when a real decoder (PIL / torchaudio / ffmpeg) is installed.
REAL_DECODERS_AVAILABLE = False

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder.

    Derives (width, height) and a FEATURE_DIM feature vector from the
    payload's sha256 — stable across runs/partitions, so tests can assert
    exact outputs.  A real decoder replaces ONLY this function.
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire the real decoder here")
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192  # plausible 64..255
    height = 64 + h[1] % 192
    feats = [round((b / 255.0) * 2 - 1, 6) for b in h[:FEATURE_DIM]]
    return width, height, feats


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (asset_id, modality, payload) → decoded meta +
    features.  One output row per input row; Arrow-batched."""
    for pdf in batches:
        decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"].astype("int64"),
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "features": [d[2] for d in decoded],
            }
        )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Run the decode pipeline over a multimodal asset table.

    Input needs columns (asset_id long, modality string, payload binary).
    """
    return assets.select("asset_id", "modality", "payload").mapInPandas(
        decode_image_batch, schema=DECODED_SCHEMA
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as opaque
    payloads so the decode plumbing runs on driver testdata."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
