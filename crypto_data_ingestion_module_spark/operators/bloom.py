"""Broadcast Bloom-filter semi-join pruning.

The classic 100 TB decontamination/semi-join trick: when a terabyte-scale
fact side must be checked for membership against a small build side (an
eval suite, a blocklist, a dimension key set), build a Bloom filter over
the build side's keys ONCE, ship the bitset to every task, and test
membership as a pure JVM expression — so ~(1 - FPR) of the fact rows die
before any join, shuffle, or Python ever sees them.  The survivors (true
hits plus an FPR-bounded sliver of false positives) then take the exact
broadcast join, which makes the final answer IDENTICAL to the exact
semi-join: the filter can only let extra candidates through (no false
negatives), and the exact confirm removes them.

Reference parity: the reference collector has no membership-pruning
surface (SURVEY §2.10 capability extension, same curation class as
operators/decontam.py which this accelerates).

Design notes:

- The bitset is built JVM-side: bit positions are
  ``pmod(xxhash64(seed_i, key), m)`` columns, exploded and DISTINCT-ed,
  and only the distinct positions (≤ k·n_build, i.e. megabytes for any
  realistic eval set) are collected — never the keys themselves.  The
  same small-side contract as every broadcast dimension in this repo.
- The bitset reaches the fact side as a one-row broadcast
  (``with_bloom_flag``'s crossJoin of a single-row ``array<long>``
  frame), NOT as an expression-tree literal: ``F.lit(list)`` /
  ``F.array(*lits)`` builds a CreateArray with m/64 child nodes, and
  Catalyst analysis over that tree costs seconds at m = 2^17 and grows
  linearly with m (measured: ~1 s/term at 2048 elements) — whereas the
  broadcast row is a VALUE whose size never touches the plan.  The
  membership test itself is ``element_at(bits, word).bitwiseAND(
  shiftleft(1L, bit)) != 0`` per seed — no UDF, fully codegen-able.
- FPR ≈ (1 - exp(-k·n/m))^k; with the default m = 2^17 bits and k = 5
  seeds, 10k build keys give ≈ 0.5% false positives.  Size ``m`` to the
  build side (the broadcast row makes big m cheap), not the fact side —
  the fact side pays the same 5-term expression per row either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_NUM_BITS = 1 << 17
DEFAULT_SEEDS = (0x5EED, 0xC4FE, 0xD00D, 0x1CEB, 0xFACE)

#: Column name the one-row bitset frame rides in on; dropped by
#: ``with_bloom_flag`` before returning.
_BITS_COL = "_bloom_bits"


def _bit_positions(col: Column, num_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    """One bit position per seed: pmod(xxhash64(seed, key), m)."""
    return [
        F.pmod(F.xxhash64(F.lit(int(s)), col), F.lit(int(num_bits)))
        for s in seeds
    ]


def bloom_bitset(
    df: DataFrame,
    col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> list[int]:
    """Build the Bloom bitset over ``df[col]`` as ``num_bits/64`` longs.

    Collects only the DISTINCT set-bit positions (bounded by
    ``len(seeds) * count_distinct(col)``) — the small-side contract.
    NULL keys are excluded explicitly (Spark's xxhash64 hashes a NULL
    input as a no-op over the seed, NOT to NULL — an unguarded NULL
    would set the five seed-only bits and make every NULL probe "hit");
    the membership test likewise forces NULL probes to False, so the
    filter matches equi-join semantics where NULL never matches.
    """
    assert num_bits % 64 == 0, num_bits
    pos = (
        df.where(F.col(col).isNotNull())
        .select(
            F.explode(F.array(*_bit_positions(F.col(col), num_bits, seeds))).alias(
                "bit"
            )
        )
        .distinct()
        .collect()
    )
    bits = [0] * (num_bits // 64)
    for row in pos:
        b = int(row["bit"])
        bits[b >> 6] |= 1 << (b & 63)
    # Spark's LongType is signed; keep values in int64 range.
    return [b - (1 << 64) if b >= (1 << 63) else b for b in bits]


def _membership(col: Column, bits: Column, num_bits: int, seeds: tuple[int, ...]) -> Column:
    """The k-term test against a bits Column (array<long>), NULL → False."""
    test = None
    for p in _bit_positions(col, num_bits, seeds):
        word = F.element_at(bits, (p / 64).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        term = word.bitwiseAND(mask) != F.lit(0).cast("long")
        test = term if test is None else (test & term)
    # NULL probes must be False (see bloom_bitset: xxhash64 never
    # returns NULL, so without this guard a NULL would probe the
    # seed-only positions instead of failing the membership test).
    return F.when(col.isNull(), F.lit(False)).otherwise(test)


def with_bloom_flag(
    df: DataFrame,
    col: str,
    bitset: list[int],
    flag: str = "_bloom_hit",
    num_bits: int = DEFAULT_NUM_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """``df`` plus a boolean ``flag``: may ``df[col]`` be in the build set.

    False is definitive (no false negatives); True is a candidate that
    an exact confirm join must verify.  The bitset joins in as a
    single-row broadcast (a BroadcastNestedLoopJoin of exactly one row —
    the same allowlisted scalar-inject shape as the repo's threshold
    crossJoins), so the test runs inside the fact scan's codegen stage
    and the bitset size never inflates the expression tree.
    """
    assert len(bitset) * 64 == num_bits, (len(bitset), num_bits)
    spark = df.sparkSession
    bits_df = spark.createDataFrame(
        [([int(b) for b in bitset],)],
        T.StructType([T.StructField(_BITS_COL, T.ArrayType(T.LongType()), False)]),
    )
    return (
        df.crossJoin(F.broadcast(bits_df))
        .withColumn(flag, _membership(F.col(col), F.col(_BITS_COL), num_bits, seeds))
        .drop(_BITS_COL)
    )
