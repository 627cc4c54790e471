"""Connected components over near-duplicate pair lists (X2 follow-through).

Pair generators (n-gram Jaccard, MinHash LSH, SimHash Hamming, embedding
cosine) emit EDGES; an actual dedup pass needs the transitive closure —
documents A-B and B-C are one duplicate group even if A-C never paired.
This module turns a pair list into per-document cluster assignments with
the canonical min-id representative, the standard final stage of a
training-corpus dedup pipeline.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Unlike
min-label propagation — whose round count is the graph DIAMETER, because
a min label advances one edge hop per round (measured 11 rounds on the
sf0.1 SimHash near-dup graph; pointer-halving on the label table does
not help, the frontier walk itself is the bound) — the star operations
rewrite the EDGE SET, attaching nodes directly to their neighborhood
minimum, so the graph contracts toward a star per component in
O(log² n) rounds (measured 4 on the same graph):

- large-star (per node u): m = min(Γ(u) ∪ {u}); re-point every STRICTLY
  LARGER neighbor v > u at m: emit (v, m).
- small-star (per node u, edges oriented large→small): m = min(Γ⁻(u) ∪
  {u}) = min smaller-neighbor; re-point u and every smaller neighbor at
  m: emit (v, m) for v ∈ Γ⁻(u) ∪ {u}, v ≠ m.

Both phases are one hash-aggregate (the per-node min — map-side
combined) plus one equi-join of the edge list against that min table
(broadcast when small, shuffle hash join at scale) and a ``distinct``;
no driver-side graph state at any point.  ``localCheckpoint`` after
each round severs the growing lineage.

Convergence: at the fixpoint the edge set is exactly {(v, root)} per
component.  Detection is the exact structural test ``_is_star_forest``
(every child has exactly one parent and no parent is a child — under
the loop's parent < child invariant that is equivalent to the
fixpoint), evaluated on the round's just-checkpointed frame, so the
loop stops at the END of the round that PRODUCES the fixpoint.  (The
r1–r10 fingerprint-equality check — count + Σ xxhash64 — needed one
extra full confirmation round to see two equal fingerprints; the
structural test removes that round and is collision-free.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_star_forest(edges: DataFrame) -> bool:
    """Exact fixpoint test for the alternating-star loop (r11: replaces
    the fingerprint-equality check, which could only SEE the fixpoint
    one round late — the confirmation round reproduced the edge set
    verbatim just so two fingerprints could match).

    The loop's invariant is parent < child (every emitted ``b`` is a
    ``least``/min).  Under that invariant, ``edges`` is the fixpoint
    {(child, root)} per component iff (a) every child appears exactly
    once — two parents for one child means small-star still has a
    re-point to do — and (b) no parent is also a child — a chain means
    large-star still contracts.  Both directions are exact (no hash
    collision caveat): a star forest with unique min-parents reproduces
    itself through both phases, and the fixpoint trivially satisfies
    the two conditions.  Cost: ONE driver action per round on the
    just-checkpointed frame, and (r17) ONE aggregation pass — each edge
    contributes a child marker for ``a`` and a parent marker for ``b``;
    per node, >1 child marker violates (a) and child+parent markers
    together violate (b).  The r12 form (count aggregate ⋈ semi-join
    aggregate via the scalar crossJoin) read the edge frame through two
    subtrees and ~5 stages; this is the identical exact test in 3
    (guide §2.4: operations keyed the same way share one exchange).
    """
    done, _ = _star_forest_probe(edges)
    return done


def _star_forest_probe(edges: DataFrame) -> tuple[bool, int]:
    """:func:`_is_star_forest` + the max symmetric degree, from the same
    single aggregation pass (the degree drives the next round's adaptive
    salt — see ``connected_components_with_stats``)."""
    marks = edges.select(
        F.col("a").alias("v"), F.lit(1).alias("c"), F.lit(0).alias("p")
    ).union(
        edges.select(
            F.col("b").alias("v"), F.lit(0).alias("c"), F.lit(1).alias("p")
        )
    )
    row = (
        marks.groupBy("v")
        .agg(
            F.sum("c").alias("nc"),
            F.max("p").alias("ip"),
            F.count(F.lit(1)).alias("deg"),
        )
        .agg(
            F.count_if(F.col("nc") > 1).alias("dup_child"),
            F.count_if((F.col("nc") > 0) & (F.col("ip") > 0)).alias("n_chain"),
            F.max("deg").alias("max_deg"),
        )
        .first()
    )
    done = row["dup_child"] == 0 and row["n_chain"] == 0
    return done, int(row["max_deg"] or 0)


def _salted_min_join(sym: DataFrame, mins: DataFrame, salt: int) -> DataFrame:
    """Equi-join of the symmetric edge list against the per-node min table,
    hardened against power-law degree skew.

    A real near-dup graph has viral stars — one template document paired
    with 10⁴–10⁶ near-copies.  The per-node MIN aggregate is already
    two-level (Spark's partial hash aggregate combines the hot key
    map-side), but the re-point JOIN shuffles both sides by ``a``: every
    edge of a 10⁶-degree node lands on ONE reducer and the round's
    wall-clock becomes that straggler.

    Fix: the mins side has exactly one row per key, so it can be
    replicated instead of co-located.  Edges take a DETERMINISTIC salt
    from the other endpoint (``xxhash64(b) % salt`` — no rand(), plans
    stay replayable), mins rows are exploded to all ``salt`` lanes, and
    the join key becomes ``(a, _salt)``: a hot node's edges now spread
    over ``salt`` reducers, while total shuffle volume grows only by
    ``salt`` × |nodes| tiny min-rows (edges, the dominant term, are
    shuffled exactly once, same as before).  The join RESULT is
    bit-identical to the unsalted join — salting only re-buckets it.
    ``salt <= 1`` keeps the plain join.
    """
    if salt <= 1:
        return sym.join(mins, "a")
    lanes = F.array(*[F.lit(i) for i in range(salt)])
    salted = sym.withColumn("_salt", F.pmod(F.xxhash64("b"), F.lit(salt)))
    mins_x = mins.withColumn("_salt", F.explode(lanes))
    return salted.join(mins_x, ["a", "_salt"]).drop("_salt")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    skew_salt: int = 8,
) -> DataFrame:
    """Pair list → (id, component) with component = min id reachable.

    Only ids that appear in some pair are returned; callers join back to
    the full corpus (see :func:`assign_clusters`) so singletons label
    themselves without ever entering the propagation joins.
    """
    df, _ = connected_components_with_stats(
        pairs, src=src, dst=dst, max_iter=max_iter, skew_salt=skew_salt
    )
    return df


def connected_components_with_stats(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    skew_salt: int = 8,
) -> tuple[DataFrame, int]:
    """:func:`connected_components` + the number of star rounds executed
    (so tests can pin the O(log² n) contraction on adversarial graphs)."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # Star edges, kept oriented (child, parent): start from the raw pairs.
    edges = e.distinct().localCheckpoint(eager=True)
    rounds = 0
    # Adaptive salt (r17, guide §2.5 "salt the key" — WHEN skew exists):
    # round 1 salts defensively; every later round salts only if the
    # probe saw a symmetric degree ≥ the threshold, because each salted
    # phase costs one extra Exchange (the min table cannot reuse its
    # aggregation partitioning under the (a, _salt) join key) and
    # re-buckets nothing when all keys are cold.  The salted and plain
    # joins are bit-identical by construction (_salted_min_join).
    salt_round = skew_salt
    salt_min_degree = int(
        os.environ.get("SPARK_GRAFT_CC_SALT_DEGREE_MIN", "65536")
    )
    for _ in range(max_iter):
        rounds += 1
        # --- large-star ---------------------------------------------------
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
        # m = min(Γ(u) ∪ {u}); re-point larger neighbors only (this keeps
        # the operation monotone — no larger node ever becomes a parent).
        # The join is salted: a viral duplicate cluster makes its root a
        # 10⁴⁺-degree hot key and the plain co-located join a one-task
        # straggler (see _salted_min_join).
        large = (
            _salted_min_join(sym, mins, salt_round)
            .filter(F.col("b") > F.col("a"))
            .select(
                F.col("b").alias("a"),
                F.least(F.col("_mn"), F.col("a")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            # no distinct here: small-star's aggregate absorbs duplicate
            # edges and the round ends in a distinct anyway — skipping it
            # saves one shuffle per round (measured ~10% of the loop).
        )
        # --- small-star ---------------------------------------------------
        oriented = large.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        if salt_round > 1:
            # r18: `oriented` feeds both the min aggregate (Exchange on
            # a) and the SALTED re-point join (Exchange on (a, _salt));
            # the differing keys defeat exchange reuse, so the whole
            # large-star subtree above would run twice in salted
            # rounds.  Materialize it once (interleaved A/B on the
            # dedup_clusters pair input: 1.185 → 1.001 s mean over 8
            # alternations, ~0.85×).  Unsalted rounds share one
            # exchange already — no checkpoint, no extra job.
            oriented = oriented.localCheckpoint(eager=True)
        omins = oriented.groupBy("a").agg(F.min("b").alias("_mn"))
        # m = min smaller-neighbor; re-point u and all its smaller
        # neighbors at m.  Mirrored skew case: a star whose root is the
        # MAX id concentrates all edges on one large-end key — same salt.
        children = (
            _salted_min_join(oriented, omins, salt_round)
            .filter(F.col("b") != F.col("_mn"))
            .select(F.col("b").alias("a"), F.col("_mn").alias("b"))
        )
        selfrow = omins.select(F.col("a"), F.col("_mn").alias("b"))
        # Eager checkpoint, THEN the fixpoint probe jobs.  (A lazy
        # checkpoint materialized by the probe action was tried and
        # measured 2× slower — the aggregate's plan does not adopt
        # the checkpoint cache, so the round DAG ran twice.)
        edges = (
            children.unionByName(selfrow)
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        done, max_deg = _star_forest_probe(edges)
        if done:
            break
        salt_round = skew_salt if max_deg >= salt_min_degree else 1
    # Fixpoint edge set is (child, root) per component; roots label
    # themselves.
    out = edges.select(
        F.col("a").alias("id"), F.col("b").alias("component")
    ).unionByName(
        edges.select(
            F.col("b").alias("id"), F.col("b").alias("component")
        ).distinct()
    )
    return out, rounds


def assign_clusters(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every corpus row gets a cluster id (min doc id of its component;
    singletons label themselves) and an ``is_rep`` flag marking the one
    representative to keep.  ``filter(is_rep)`` IS the deduplicated
    corpus; ``filter(~is_rep)`` is the removal list."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        corpus.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias(
                "is_rep"
            ),
        )
    )


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**6,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """PageRank with a fixed iteration count in EXACT integer arithmetic.

    Ranks are maintained as integers in units of ``1/scale`` and every
    step is integer floor math — ``r DIV deg`` per out-edge, ``(damp_num
    * incoming) DIV damp_den`` for damping — so the result is
    bit-identical across engines, partitionings, and aggregation orders
    (cross-engine float parity is impossible for iterated ``0.85 * x``;
    quantizing the recurrence instead of the output makes the whole
    computation order-free, the same trick as the registry's micro-unit
    ``dsum``).  The quantization error vs real-valued PageRank is
    bounded by iterations * (1 + damp) ulps of 1/scale per node —
    irrelevant at the default ppm resolution for any ranking use.

    Semantics: standard damped PageRank on the DISTINCT edge set,
    dangling mass dropped (nodes without out-edges absorb but do not
    redistribute — the common simplification; total mass decays toward
    the teleport floor, which affects no relative ordering).  Multi-edges
    are collapsed by ``distinct`` so each neighbor receives one share.

    100 TB shape: per iteration exactly one shuffle — the edge list is
    joined to the rank table on ``src`` (both sides hash-partitioned on
    the same key, so consecutive iterations reuse the edge side's
    partitioning) and the contributions hash-aggregate on ``dst`` with
    map-side combine.  No driver-side graph state; the rank table is
    ``localCheckpoint``-ed each round to sever the growing lineage,
    exactly like the star-contraction loop above.  Overflow bound:
    ``n_nodes * scale * damp_num`` must stay under 2^63 — at the default
    ppm scale that is ~10^11 nodes, far beyond any corpus graph here.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    if not assume_distinct:
        # multi-edges collapse so each neighbor receives one share;
        # callers whose edge build is provably duplicate-free pass
        # ``assume_distinct=True`` and skip this full-edge Exchange
        # (guide §2.4 "a distinct on data that is already unique")
        e = e.distinct()
    e = (
        e
        # The edge list is the loop invariant every iteration re-reads;
        # without this the upstream plan (at the call site: a fact-fact
        # join + distinct) re-executes once PER REFERENCE because the
        # rank checkpoints break cross-iteration exchange reuse
        # (measured 6.2 s -> the edge build dominating at sf0.1).  This
        # is the localCheckpoint analogue of persisting the edge RDD in
        # classic Pregel loops.
        .localCheckpoint(eager=False)
    )
    # Fold the out-degree into the edge list ONCE — the loop then joins
    # only the rank table per iteration instead of (deg ⋈ e ⋈ ranks).
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = (scale * (damp_den - damp_num)) // damp_den
    ranks = nodes.withColumn("rank", F.lit(int(scale)).cast("long"))
    for _ in range(iterations):
        contrib = e_deg.join(ranks, e_deg["src"] == ranks["node"]).select(
            "dst", F.expr("rank DIV deg").alias("share")
        )
        incoming = contrib.groupBy(F.col("dst").alias("node")).agg(
            F.sum("share").alias("inflow")
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(base)).cast("long")
                    + F.expr(
                        f"({damp_num} * coalesce(inflow, 0L)) DIV {damp_den}"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
