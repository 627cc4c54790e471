"""Stratified / reservoir sampling (training-data curation staple).

Two modes:

- :func:`stratified_reservoir` — deterministic *exact-N* per-stratum
  sample: rank rows inside each stratum by a seeded hash of their id and
  keep the first N.  Layout-independent (the hash, not scan order,
  decides) and reproducible across engines — ``md5`` of the id string is
  bit-identical in Spark and DuckDB, so the query is oracle-checkable.
- :func:`stratified_fractions` — thin wrapper over ``df.sampleBy``
  (per-stratum Bernoulli fractions): O(1) memory, single pass, but only
  *expected* counts and partitioning-dependent output; use for
  approximate downsampling, not reproducible curation.

Scale: the rank-≤-N window is NOT a full sort at scale — Spark ≥3.5
rewrites ``row_number() <= N`` filters into a ``WindowGroupLimit``
(per-partition partial top-N *before* the shuffle), so each input
partition ships at most N rows per stratum.  The test asserts that node
is present in the physical plan.

Reference parity: the reference has no sampling surface (SURVEY §2.10
capability extension for LLM-pipeline curation).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reservoir_rank_key(id_col: str, seed: int = 42):
    """Seeded deterministic pseudo-random rank key: md5 of ``id#seed``.

    md5 hex (lowercase) is bit-identical in Spark and DuckDB, unlike
    xxhash64 (Spark-only) or rand() (engine-specific streams)."""
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}")))


def stratified_reservoir(
    df: DataFrame,
    stratum_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by seeded id-hash rank — equivalent to a reservoir
    sample but deterministic and re-runnable.  Ties (impossible for
    distinct ids under md5) break by id."""
    key = reservoir_rank_key(id_col, seed)
    w = Window.partitionBy(*stratum_cols).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_per_stratum)
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    caps: Mapping[str, int],
    id_col: str,
    seed: int = 42,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic corpus-mixture composition: exactly ``caps[s]`` rows
    from stratum ``s`` (fewer if the stratum is smaller), strata not in
    ``caps`` dropped — the "N docs from web, M from code, K from papers"
    recipe step of a training-data pipeline, made reproducible by the
    same seeded md5 rank as :func:`stratified_reservoir`.

    Scale shape: the rank filter is split into a LITERAL bound
    (``max(caps)``) plus the per-stratum map lookup.  The literal
    conjunct is what Spark's ``InferWindowGroupLimit`` needs to install
    a ``WindowGroupLimit`` partial top-N below the shuffle, so each
    input partition ships at most ``max(caps)`` rows per stratum instead
    of the whole stratum; the map lookup then trims to the exact
    per-stratum cap after the window.  Strata weights are data-size
    independent (caps are absolute), which is what you want when
    composing to a token budget.
    """
    cap_entries = [F.lit(x) for kv in caps.items() for x in kv]
    cap = F.element_at(F.create_map(*cap_entries), F.col(stratum_col))
    key = reservoir_rank_key(id_col, seed)
    w = Window.partitionBy(stratum_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(stratum_col).isin(list(caps)))
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= F.lit(max(caps.values())))
        .filter(F.col(rank_col) <= cap)
    )


def stratified_fractions(
    df: DataFrame,
    stratum_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): single pass, no
    shuffle, expected-count semantics.  Output depends on partitioning —
    pair with :func:`stratified_reservoir` when reproducibility matters."""
    return df.sampleBy(stratum_col, dict(fractions), seed)


def systematic_pps_sample(
    docs: DataFrame,
    step: int,
    weight_col: str = "n_chars",
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: walk each
    stratum's cumulative weight axis and select the document straddling
    every multiple of ``step`` — the classic PPS design (selection
    probability ~ weight/step) with ZERO randomness, so it is exactly
    reproducible and oracle-checkable.  The token-budget shape: sampling
    "one doc per ~step chars" yields a mixture whose per-source volume
    tracks the corpus while long docs are kept proportionally often.

    All arithmetic is exact integers (running sum + integer division) —
    no pow/log, no random state.  Scale: the running sum partitions by
    stratum (the same per-stratum window discipline as pack_sequences);
    a global single-window variant would serialize and is deliberately
    not offered.
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(weight_col).cast("long")).over(w)
    df = docs.select(
        id_col, stratum_col, weight_col
    ).withColumn("cum", cum)
    tick = F.expr(f"cum DIV {int(step)}")
    prev_tick = F.expr(f"(cum - {weight_col}) DIV {int(step)}")
    return (
        df.filter(tick > prev_tick)
        .select(
            id_col,
            stratum_col,
            weight_col,
            tick.cast("long").alias("tick"),
        )
    )
