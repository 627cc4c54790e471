"""Fixed-point PageRank (operators/graph.py:pagerank_fixed_point).

The oracle pairing (trade_graph_pagerank) pins Spark-vs-DuckDB equality
of the full recurrence; these tests pin the SEMANTICS on graphs small
enough to verify by hand, which the oracle (same formula, other engine)
cannot distinguish from a consistently-wrong implementation.
"""

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.graph import (
    pagerank_fixed_point,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_cycle_is_symmetric_and_conserves_mass(spark):
    # a <-> b: every iteration each node passes its whole rank across,
    # so both stay at scale (base 150000 + 85% of 1_000_000 = 1_000_000).
    got = _ranks(pagerank_fixed_point(_edges(spark, [(1, 2), (2, 1)]), 3))
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_star_concentrates_rank_on_hub(spark):
    # 3 leaves -> hub, hub -> leaf 1.  Hand-rolled integer recurrence:
    # r0 = 1e6 each.
    # i1: hub gets 3e6*85% + base = 2_700_000; leaf1 gets hub's 1e6
    #     share -> 1_000_000; leaves 2,3 get teleport floor 150_000.
    got = _ranks(
        pagerank_fixed_point(
            _edges(spark, [(2, 1), (3, 1), (4, 1), (1, 2)]), iterations=1
        )
    )
    assert got[1] == 150_000 + (85 * 3_000_000) // 100  # 2_700_000
    assert got[2] == 150_000 + (85 * 1_000_000) // 100  # 1_000_000
    assert got[3] == 150_000
    assert got[4] == 150_000


def test_dangling_node_absorbs_without_redistributing(spark):
    # 1 -> 2, 2 has no out-edges: after one step node 2 holds the
    # inflow, node 1 only the teleport floor; the dangling mass is
    # dropped (documented simplification), not recycled.
    got = _ranks(pagerank_fixed_point(_edges(spark, [(1, 2)]), iterations=2))
    assert got[1] == 150_000
    assert got[2] == 150_000 + (85 * (150_000 // 1)) // 100


def test_multi_edges_collapse_to_one_share(spark):
    # Duplicate (1,2) edges must not double node 2's share.
    once = _ranks(pagerank_fixed_point(_edges(spark, [(1, 2), (1, 3)]), 1))
    dup = _ranks(
        pagerank_fixed_point(_edges(spark, [(1, 2), (1, 2), (1, 3)]), 1)
    )
    assert once == dup
    assert once[2] == once[3]  # equal split of node 1's rank


def test_rank_total_never_exceeds_initial_mass(spark):
    # With dangling drop + floor division, total mass is non-increasing:
    # an overflow or double-count would show up as growth.
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (2, 4)])
    r = pagerank_fixed_point(e, iterations=4)
    total = r.agg(F.sum("rank").alias("t")).first()["t"]
    assert total <= 4 * 1_000_000
