"""Bit-parity pins for the r17 split-long exact-sum fast path.

``functions.exactsum`` replaces the per-row ``sum(DECIMAL(38,0))``
accumulation with two codegen long sums recombined once per group; the
whole point is that the VALUE is unchanged, so these tests compare the
fast path against the wide DECIMAL form bit-for-bit over inputs that
exercise every edge the parity argument relies on: negatives, exact
rounding halves (both signs), NULLs (all-null and mixed groups), and
magnitudes near the per-row micro-unit bound.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.exactsum import (
    fsum,
    lsum_dec,
    usum_dec,
)


def _wide(c, scale=1_000_000.0):
    return (
        F.sum(F.round(c * scale).cast("decimal(38,0)")).cast("double") / scale
    )


def _bits(x):
    return None if x is None else struct.pack("d", x)


def _groups(df, agg_col):
    rows = df.groupBy("g").agg(agg_col.alias("s")).collect()
    return {r["g"]: _bits(r["s"]) for r in rows}


def test_fsum_bit_parity_negatives_and_halves(spark):
    rows = [(i % 7, (-1) ** i * (i * 1.2345678 + 0.5 / 1e6)) for i in range(20001)]
    rows += [(9, 0.0000005), (9, -0.0000005), (9, -0.0000015)]  # exact halves
    df = spark.createDataFrame(rows, "g int, v double")
    assert _groups(df, fsum(F.col("v"))) == _groups(df, _wide(F.col("v")))


def test_fsum_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, None), (1, 2.5), (2, None), (3, -1.25)], "g int, v double"
    )
    assert _groups(df, fsum(F.col("v"))) == _groups(df, _wide(F.col("v")))


def test_fsum_large_magnitudes(spark):
    # |v| up to 1e9 (micro-units ~1e15): far past any fact-table value,
    # still inside the documented per-row domain
    rows = [(0, (-1) ** i * (1e9 - i * 1.000001)) for i in range(5001)]
    df = spark.createDataFrame(rows, "g int, v double")
    assert _groups(df, fsum(F.col("v"))) == _groups(df, _wide(F.col("v")))


def test_usum_dec_carried_partial_reaggregates(spark):
    # the carried-partial form: partial per (g, salt), recombined
    # downstream by a plain decimal SUM — equals the one-level wide sum
    rows = [((i * 7) % 5, i % 16, (-1) ** i * i * 0.317) for i in range(20000)]
    df = spark.createDataFrame(rows, "g int, salt int, v double")
    two_level = (
        df.groupBy("g", "salt")
        .agg(usum_dec(F.col("v"), 1_000_000.0).alias("p"))
        .groupBy("g")
        .agg((F.sum("p").cast("double") / 1_000_000.0).alias("s"))
        .collect()
    )
    ref = {r["g"]: _bits(r["s"]) for r in df.groupBy("g").agg(_wide(F.col("v")).alias("s")).collect()}
    assert {r["g"]: _bits(r["s"]) for r in two_level} == ref


def test_fsum_nonfinite_matches_wide(spark):
    # r18 (ADVICE r17): NaN / ±Inf must behave exactly as the wide
    # DECIMAL form — double→DECIMAL casts them to NULL (row dropped),
    # whereas an unguarded double→long cast sends NaN→0 and
    # ±Inf→±Long.MaxValue, silently corrupting the total.
    inf = float("inf")
    nan = float("nan")
    df = spark.createDataFrame(
        [
            (1, 2.5), (1, inf), (1, 1.25),          # +Inf inside a group
            (2, -inf), (2, 100.0),                  # -Inf inside a group
            (3, nan), (3, 7.0),                     # NaN inside a group
            (4, nan), (4, nan),                     # all-NaN group → NULL
            (5, inf), (5, -inf), (5, nan),          # all-non-finite → NULL
            (6, 0.0000015), (6, -3.5),              # finite control group
        ],
        "g int, v double",
    )
    assert _groups(df, fsum(F.col("v"))) == _groups(df, _wide(F.col("v")))
    # the non-finite rows DROP (like the wide form), they do not zero
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(fsum(F.col("v")).alias("s")).collect()
    }
    assert got[1] == 3.75 and got[2] == 100.0 and got[3] == 7.0
    assert got[4] is None and got[5] is None


def test_fsum_domain_boundary_documented(spark):
    # r18 (VERDICT r17 item 6): pin the documented per-row domain edge.
    # |round(c·1e6)| must fit a long; 9.2e12 is inside (exact vs the
    # wide form), and the module documents that values beyond ±2^63
    # units are OUTSIDE the domain (callers must use dsum_wide — the
    # fast path is only contracted inside the bound).
    hi = 9.2e12  # |u| = 9.2e18 < 2^63 ≈ 9.223e18 — the documented edge
    df = spark.createDataFrame(
        [(0, hi), (0, -hi), (0, hi)], "g int, v double"
    )
    assert _groups(df, fsum(F.col("v"))) == _groups(df, _wide(F.col("v")))


def test_lsum_dec_pre_rounded_longs(spark):
    rows = [(i % 3, (-1) ** i * (i * 2654435761 % (1 << 45))) for i in range(10001)]
    df = spark.createDataFrame(rows, "g int, u long")
    fast = _groups(df, lsum_dec(F.col("u")).cast("double"))
    wide = _groups(df, F.sum(F.col("u").cast("decimal(38,0)")).cast("double"))
    assert fast == wide
