"""Exact integer sums on the codegen fast path (r17, guide §2.3).

The engine's fixed-point policy sums pre-rounded integer "units"
(micro-units at 1e-6, pico at 1e-12) so results are bit-identical
across engines, partitionings, and aggregation orders.  The r1–r16
physical form was one ``sum(DECIMAL(38,0))`` per measure — but Spark's
decimal aggregation runs object-path BigDecimal adds (decimal precision
38 never takes the compact-long path), measured 5.1 s vs 1.0 s on the
sf0.1 Q1 aggregate.

``lsum_dec`` keeps the identical value while summing LONGs inside
whole-stage codegen: the unit value is split into two limbs,

    u = (u >> 20) * 2^20 + (u & 0xFFFFF)        (exact, incl. negatives)

each limb is summed as a plain long (map-side combined, codegen'd), and
the limbs recombine in DECIMAL(38,0) once per GROUP, not per row.

Parity argument (pinned in tests/test_exactsum.py):
- the limb identity is exact two's-complement arithmetic for every
  long, negative or not (arithmetic shift + unsigned mask);
- every partial limb sum is an exact long within the documented domain;
- the recombination is exact decimal arithmetic on two terms;
- the final DECIMAL value is the identical integer the decimal-per-row
  form produces, so any downstream cast rounds identically.
- NULL rows drop from both limb sums together (both limbs derive from
  the same ``u``), so null semantics match plain ``sum`` exactly.

Overflow domain (the price of the fast path — callers outside it must
keep the wide DECIMAL form):
- per row ``|u| < 2^63`` (micro-units: |value| ≤ 9.2e12);
- per group, the low-limb sum caps rows at 2^43 ≈ 8.8e12, and the
  high-limb sum at ``2^63 / (max|u| / 2^20)`` — for micro-unit values
  ≤ 1e6 that is also ~8.8e12 rows per group.  A 100 TB fact table
  (~10^12 rows) stays an order of magnitude inside the bound even for
  one global group.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LIMB_BITS = 20
_LIMB_MASK = (1 << _LIMB_BITS) - 1
_LIMB_BASE = 1 << _LIMB_BITS


def lsum_dec(u: Column) -> Column:
    """Exact sum of an integer-valued LONG column as DECIMAL(38,0) via
    the 20-bit limb split (see module docstring for the parity and
    domain analysis)."""
    hi = F.sum(F.shiftright(u, _LIMB_BITS)).cast("decimal(38,0)")
    lo = F.sum(u.bitwiseAND(F.lit(_LIMB_MASK))).cast("decimal(38,0)")
    return hi * F.lit(_LIMB_BASE) + lo


def usum_dec(c: Column, scale: float) -> Column:
    """``lsum_dec(round(c * scale))`` — the unit-rounding fixed-point sum
    as DECIMAL(38,0) (the carried-partial form: exact integer, safe to
    re-aggregate downstream).

    Non-finite inputs map to NULL (row dropped), matching the wide
    DECIMAL form bit-for-bit: a non-ANSI double→long cast sends NaN to
    0 and ±Inf to ±Long.MaxValue, silently corrupting the group total,
    whereas double→DECIMAL yields NULL.  The guard is two codegen
    comparisons per row — measured noise next to the limb sums.  (Spark
    comparison semantics make the check exact: ``isnan`` catches NaN,
    and for ±Inf ``abs(r) = Inf`` is true while for any finite r it is
    false.)  Finite values beyond ±2^63 units remain OUTSIDE the
    documented domain — callers with such values must use the wide
    form, as before."""
    r = F.round(c * scale)
    finite = ~F.isnan(r) & (F.abs(r) != float("inf"))
    return lsum_dec(F.when(finite, r).cast("long"))


def fsum(c: Column, scale: float = 1_000_000.0) -> Column:
    """Order-insensitive engine-exact fixed-point sum of doubles:
    ``round(c·scale)`` totalled exactly, returned as DOUBLE in original
    units — the fast-path twin of the classic
    ``sum(round(c·scale)::DECIMAL(38,0))::DOUBLE / scale``."""
    return usum_dec(c, scale).cast("double") / scale
