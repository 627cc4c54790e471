"""TPC-H-shaped relational breadth suite.

The reference performs no relational joins (SURVEY.md §2.5 — exchanges are
concatenated, not joined), so these queries are capability extensions: they
prove the engine's Catalyst surface on the join/subquery shapes a warehouse
user actually runs — semi/anti joins, decorrelated scalar subqueries,
grouped HAVING-style thresholds, top-k with deterministic tie-breaks,
count-distinct rollups, and max-subquery selection.

Scale notes (100 TB):
- Dims (``nation``, ``region``, single-row thresholds, the max-revenue row)
  are explicitly ``broadcast()`` — they are small at ANY scale.
- Fact⨝fact joins (orders⨝lineitem, customer⨝orders) are left to
  shuffle-hash/sort-merge under AQE: at 100 TB neither side broadcasts, and
  both sides hash-partition on the join key so Catalyst can reuse the
  exchange for the downstream group-by on the same key.
- Every double SUM goes through the fixed-point ``dsum``/``osum`` pair
  (micro-unit DECIMAL(38,0) arithmetic) so partial/final aggregation order
  can never drift from the DuckDB oracle — see plans.queries docstring.

All date literals sit inside the testdata span (orders 1995-01→2001-08,
lineitem shipdate 1995-01→2001-11) and every query returns >0 rows at
sf0.01 and sf0.1 (verified against DuckDB at both SFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.exactsum import usum_dec
from crypto_data_ingestion_module_spark.plans.queries import (
    QuerySpec,
    _register,
    _t,
    dsum,
    osum,
)

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


# --------------------------------------------------------------------------
# Q3 shape: shipping-priority top-k (customer ⨝ orders ⨝ lineitem)
# --------------------------------------------------------------------------

def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _TS("1998-06-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _TS("1998-06-01 00:00:00")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        # LIMIT requires a total order that is unique: revenue ties are
        # broken by l_orderkey, so both engines pick the same 10 rows.
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_register(
    QuerySpec(
        name="shipping_priority_topk",
        survey_ids=("A2", "D6"),
        description="TPC-H Q3 shape: 3-way join, grouped revenue, "
        "deterministic top-10 (tie-break by order key)",
        spark=_shipping_priority,
        oracle=f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {osum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    )
)


# --------------------------------------------------------------------------
# Semi join: customers with at least one open order, rolled up by nation
# --------------------------------------------------------------------------

def _open_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        _t(spark, sf_dir, "customer")
        .join(
            open_orders,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal")).alias("acctbal_total"),
        )
    )


_register(
    QuerySpec(
        name="open_order_customers_by_nation",
        survey_ids=("A2",),
        description="left-semi join (EXISTS): customers holding an open "
        "order, counted per nation (broadcast nation dim)",
        spark=_open_order_customers,
        oracle=f"""
SELECT n_name AS nation, count(*) AS n_custs, {osum('c_acctbal')} AS acctbal_total
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
GROUP BY n_name
""",
    )
)


# --------------------------------------------------------------------------
# Q22 shape: anti join + scalar subquery (above-average balance, no open
# orders)
# --------------------------------------------------------------------------

def _rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # scalar subquery: one row, broadcast to every executor.  AVG is
    # dsum/count so the threshold double is bit-identical to the oracle.
    thresh = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0).agg(
            (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("_avg_bal")
        )
    )
    open_orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return (
        cust.crossJoin(thresh)
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(
            open_orders,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal")).alias("acctbal_total"),
        )
    )


_register(
    QuerySpec(
        name="rich_idle_customers",
        survey_ids=("A2",),
        description="TPC-H Q22 shape: scalar-subquery threshold "
        "(broadcast single row) + left-anti join (NOT EXISTS open order)",
        spark=_rich_idle_customers,
        oracle=f"""
SELECT n_name AS nation, count(*) AS n_custs, {osum('c_acctbal')} AS acctbal_total
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
  SELECT {osum('c_acctbal')} / count(*) FROM customer WHERE c_acctbal > 0
)
AND NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
GROUP BY n_name
""",
    )
)


# --------------------------------------------------------------------------
# Q17 shape: decorrelated per-group scalar subquery (small-quantity revenue)
# --------------------------------------------------------------------------

def _small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    brand_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    )
    # The correlated `l_quantity < 0.5 * (SELECT avg(..) WHERE same part)`
    # decorrelates into one per-part aggregate joined back on l_partkey —
    # the exact rewrite Catalyst would do for the subquery form, written
    # explicitly so the per-part AVG uses fixed-point dsum/count.
    per_part_avg = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("_avg_qty")
    )
    return (
        li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part_avg, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(
            dsum(F.col("l_extendedprice")).alias("total_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_register(
    QuerySpec(
        name="small_qty_part_revenue",
        survey_ids=("A2",),
        description="TPC-H Q17 shape: decorrelated per-part avg-quantity "
        "subquery, revenue of below-half-average lineitems",
        spark=_small_qty_revenue,
        oracle=f"""
SELECT {osum('l_extendedprice')} AS total_price, count(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS _pk, {osum('l_quantity')} / count(*) AS _avg_qty
  FROM lineitem GROUP BY l_partkey
) ON l_partkey = _pk
WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * _avg_qty
""",
    )
)


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share over one ship month
# --------------------------------------------------------------------------

def _promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-10-01 00:00:00"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(
            _t(spark, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey")
        )
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(disc_price).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_share"
            ),
            "promo_revenue",
            "total_revenue",
            "n_rows",
        )
    )


_register(
    QuerySpec(
        name="promo_revenue_share",
        survey_ids=("A2",),
        description="TPC-H Q14 shape: conditional revenue share over one "
        "ship month (two fixed-point sums, then one double division)",
        spark=_promo_revenue,
        oracle=f"""
SELECT 100.0 * promo_revenue / total_revenue AS promo_share,
       promo_revenue, total_revenue, n_rows
FROM (
  SELECT
    {osum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_revenue,
    {osum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
    count(*) AS n_rows
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
)
""",
    )
)


# --------------------------------------------------------------------------
# Q13 shape: outer join + double aggregation (order-count distribution)
# --------------------------------------------------------------------------

def _order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_register(
    QuerySpec(
        name="customer_order_counts_dist",
        survey_ids=("A2", "A3"),
        description="TPC-H Q13 shape: left-outer join then two-level "
        "aggregation — orders-per-customer histogram (all-integer output)",
        spark=_order_count_distribution,
        oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    )
)


# --------------------------------------------------------------------------
# Q16 shape: count-distinct rollup (supplier breadth per part class)
# --------------------------------------------------------------------------

def _supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


_register(
    QuerySpec(
        name="supplier_part_breadth",
        survey_ids=("A2", "A3"),
        description="TPC-H Q16 shape: exact count-distinct suppliers per "
        "(brand, type, size) class, lineitem as the part-supplier relation",
        spark=_supplier_part_breadth,
        oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25)
GROUP BY p_brand, p_type, p_size
""",
    )
)


# --------------------------------------------------------------------------
# Q15 shape: max-subquery selection (top supplier by quarterly revenue)
# --------------------------------------------------------------------------

def _top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    # max is exact over fixed-point sums; equality-select keeps ALL tied
    # suppliers (no limit), so no tie-break is needed.
    max_rev = F.broadcast(
        revenue.agg(F.max("total_revenue").alias("_max_rev"))
    )
    return (
        revenue.crossJoin(max_rev)
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


_register(
    QuerySpec(
        name="top_supplier_revenue",
        survey_ids=("A2", "D4", "D6"),
        description="TPC-H Q15 shape: quarterly revenue per supplier, "
        "select the max via broadcast single-row join (ties all kept)",
        spark=_top_supplier,
        oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    {osum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    )
)


# --------------------------------------------------------------------------
# Q21 shape: waiting suppliers (double correlated EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------
#
# The testdata lacks l_receiptdate/l_commitdate, so "late" is proxied by
# l_shipdate > o_orderdate + 90 days; the SHAPE is TPC-H Q21's: suppliers
# who were the SOLE late supplier on a multi-supplier finished order.
#
# The oracle states the literal correlated form (EXISTS another supplier
# in the order; NOT EXISTS another LATE supplier).  The Spark side is the
# decorrelated aggregate rewrite — per-order distinct-supplier and
# late-supplier counts, then n_supp > 1 AND n_late = 1 — which at 100 TB
# is two hash aggregates and equi-joins ON THE SAME KEY (l_orderkey), so
# Catalyst reuses one exchange across all of them; no per-row subquery
# probes exist to begin with.  The hash-equality of the two forms is the
# point of the pairing.

def _waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    n_supp = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    n_late = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_late")
    )
    return (
        late.join(n_supp, "l_orderkey")
        .join(n_late, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


_register(
    QuerySpec(
        name="waiting_suppliers",
        survey_ids=("A2", "D6"),
        description="TPC-H Q21 shape: sole late supplier on multi-supplier "
        "finished orders; Spark runs the decorrelated aggregate rewrite, "
        "the oracle the literal EXISTS/NOT-EXISTS form",
        spark=_waiting_suppliers,
        oracle="""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
""",
    )
)


# --------------------------------------------------------------------------
# Q7 shape: cross-nation shipping volume by year.  Two BROADCAST dim
# joins (nation aliased twice — supplier side and customer side) hanging
# off the fact⨝fact chain; the year extraction lands in the group key.
# The classic two-nation literal filter is widened to "different
# nations" because the synthetic supplier table is thin — the join/agg
# shape (the point of the query) is identical.
# --------------------------------------------------------------------------

def _volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            )
        )
    )


_register(
    QuerySpec(
        name="volume_shipping_by_year",
        survey_ids=("A2",),
        description="TPC-H Q7 shape: fact chain with the nation dim "
        "broadcast-joined twice (supplier side + customer side), "
        "cross-nation filter, year-bucketed volume",
        spark=_volume_shipping,
        oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {osum('l_extendedprice * (1 - l_discount)')} AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
    )
)


# --------------------------------------------------------------------------
# Q18 shape: large-volume customers — a grouped-HAVING subquery feeding a
# semi join back into the fact chain (the "IN (SELECT ... GROUP BY ...
# HAVING ...)" pattern), then a re-aggregation at order grain.
# --------------------------------------------------------------------------

def _large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 250.0)
        .select("l_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .join(big, F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(
            _t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_register(
    QuerySpec(
        name="large_volume_customers",
        survey_ids=("A2", "D6"),
        description="TPC-H Q18 shape: grouped-HAVING subquery (orders "
        "whose summed quantity crosses a threshold) semi-joined back "
        "into the fact chain, re-aggregated at order grain, "
        "deterministic top-20",
        spark=_large_volume_customers,
        oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {osum('l_quantity')} AS total_qty
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING {osum('l_quantity')} > 250.0
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
""",
    )
)


# --------------------------------------------------------------------------
# Q10 shape: returned-item customer ranking — quarter-windowed fact
# chain restricted to returned lines, revenue ranked per customer with
# the nation dim broadcast in, deterministic top-20.
# --------------------------------------------------------------------------

def _returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1997-04-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_register(
    QuerySpec(
        name="returned_item_ranking",
        survey_ids=("A2", "D6"),
        description="TPC-H Q10 shape: quarter-windowed returned-lines "
        "fact chain, per-customer revenue with broadcast nation dim, "
        "deterministic top-20",
        spark=_returned_item_ranking,
        oracle=f"""
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       {osum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    )
)


# --------------------------------------------------------------------------
# Q4 shape: order-priority checking — EXISTS with a mixed equi + range
# condition pushed into a left-semi join.  Adapted: the testdata lineitem
# carries no commitdate/receiptdate (crypto_collector's schema world has no
# such columns either), so the late-line predicate is l_shipdate >
# o_orderdate — same decorrelation shape, same join strategy.
# --------------------------------------------------------------------------

def _order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1996-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_register(
    QuerySpec(
        name="order_priority_exists",
        survey_ids=("A2", "A3"),
        description="TPC-H Q4 shape: EXISTS decorrelated to a left-semi "
        "join with an extra range conjunct, priority-grouped counts",
        spark=_order_priority_exists,
        oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
    )
)


# --------------------------------------------------------------------------
# Q8 shape: national market share — one pass computes both the numerator
# (revenue supplied by the target nation) and the denominator (all revenue
# into the target region) as conditional fixed-point sums; no second join.
# --------------------------------------------------------------------------

def _market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("c_regionkey"),
    )
    asia = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    promo_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        _t(spark, sf_dir, "lineitem")
        .join(promo_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(asia),
            F.col("c_regionkey") == F.col("r_regionkey"),
            "left_semi",
        )
        .join(_t(spark, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0)
            ).alias("nation_revenue"),
            dsum(rev).alias("total_revenue"),
        )
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            (F.col("nation_revenue") / F.col("total_revenue")).alias(
                "market_share"
            ),
        )
    )


_register(
    QuerySpec(
        name="market_share_by_year",
        survey_ids=("A2",),
        description="TPC-H Q8 shape: NATION_3's yearly share of PROMO-part "
        "revenue into ASIA; numerator and denominator as conditional "
        "fixed-point sums in a single aggregation pass",
        spark=_market_share,
        oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  {osum("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    AS nation_revenue,
  {osum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
  {osum("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    / {osum('l_extendedprice * (1 - l_discount)')} AS market_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  AND n2.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
GROUP BY year(o_orderdate)
""",
    )
)


# --------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year.  Adapted: the
# testdata has no partsupp/ps_supplycost, so cost is modeled as 10% of the
# part's retail price per unit — the join/aggregation shape (part-name
# pattern filter, dual fact-dim chain, nation x year profit) is Q9's.
# --------------------------------------------------------------------------

def _product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    widget_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.1 * F.col("l_quantity")
    return (
        _t(spark, sf_dir, "lineitem")
        .join(widget_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )


_register(
    QuerySpec(
        name="product_profit_by_nation_year",
        survey_ids=("A2",),
        description="TPC-H Q9 shape: part-name pattern filter, "
        "supplier-nation x order-year profit (cost modeled from "
        "p_retailprice; testdata has no partsupp)",
        spark=_product_profit,
        oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  {osum('l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity')}
    AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
""",
    )
)


# --------------------------------------------------------------------------
# Q11 shape: important-part identification — per-part shipped value vs a
# scalar-subquery threshold (a fraction of the global total).  The global
# total is a one-row aggregate broadcast into the HAVING comparison.
# --------------------------------------------------------------------------

def _important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    value = F.col("l_quantity") * F.col("l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(dsum(value).alias("part_value"))
    # scale-free threshold: 1.2x the mean per-part value (a fixed global
    # fraction returns nothing once the part count grows with SF).  The
    # global total re-aggregates the PART-GRAIN frame — part_value is
    # integer micro-units, so dsum-of-dsums is exact and equals a direct
    # sum, and lineitem is scanned exactly once.
    total = F.broadcast(
        per_part.agg(
            (dsum(F.col("part_value")) / F.count(F.lit(1)) * 1.2).alias(
                "_threshold"
            )
        )
    )
    return (
        per_part.crossJoin(total)
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("l_partkey", "part_value")
    )


_register(
    QuerySpec(
        name="important_parts",
        survey_ids=("A2",),
        description="TPC-H Q11 shape: per-part value filtered by a "
        "broadcast scalar-subquery threshold (1.2x the mean per-part "
        "value, scale-free)",
        spark=_important_parts,
        oracle=f"""
SELECT l_partkey, {osum('l_quantity * l_extendedprice')} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {osum('l_quantity * l_extendedprice')} > (
  SELECT {osum('l_quantity * l_extendedprice')}
           / count(DISTINCT l_partkey) * 1.2
  FROM lineitem
)
""",
    )
)


# --------------------------------------------------------------------------
# Q19 shape: disjunctive predicate revenue — an OR-of-ANDs across both join
# sides.  Catalyst extracts the common l_partkey = p_partkey conjunct as the
# equi-join key and leaves the disjunction as a post-join filter; the
# per-branch part predicates are pushed into the part scan as
# (brand=.. AND size..) OR (brand=.. AND size..).
# --------------------------------------------------------------------------

def _disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    branch1 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1.0, 20.0)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10.0, 40.0)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20.0, 50.0)
    )
    return j.filter(branch1 | branch2 | branch3).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


_register(
    QuerySpec(
        name="disjunctive_revenue",
        survey_ids=("A2", "F1"),
        description="TPC-H Q19 shape: OR-of-ANDs predicate spanning both "
        "join sides; common equi-key extracted, branch predicates pushed "
        "to the part scan",
        spark=_disjunctive_revenue,
        oracle=f"""
SELECT {osum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1.0 AND 20.0)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10.0 AND 40.0)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20.0 AND 50.0)
""",
    )
)


# --------------------------------------------------------------------------
# Q2 shape: cheapest-supplier selection per part — a correlated MIN
# subquery decorrelated to a per-part window rank over the candidate
# suppliers (distinct shippers from lineitem).  Adapted: no partsupp table,
# so "candidate suppliers of a part" = suppliers that shipped it and the
# minimized attribute is s_acctbal (tie-broken by s_suppkey so both engines
# select the identical row).
# --------------------------------------------------------------------------

def _min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    shippers = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = shippers.join(
        _t(spark, sf_dir, "supplier"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    big_parts = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return (
        best.join(big_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_size",
            F.col("s_name").alias("supplier"),
            "s_acctbal",
            F.col("n_name").alias("supp_nation"),
        )
    )


_register(
    QuerySpec(
        name="min_acctbal_supplier_per_part",
        survey_ids=("A2", "D6"),
        description="TPC-H Q2 shape: correlated-MIN supplier selection "
        "decorrelated to a per-part window rank over distinct shippers, "
        "deterministic tie-break",
        spark=_min_acctbal_supplier,
        oracle="""
WITH cand AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), ranked AS (
  SELECT l_partkey, s_name, s_acctbal, s_nationkey,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
  FROM cand JOIN supplier ON l_suppkey = s_suppkey
)
SELECT p_partkey, p_name, p_brand, p_size,
       s_name AS supplier, s_acctbal, n_name AS supp_nation
FROM ranked
JOIN part ON l_partkey = p_partkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1 AND p_size >= 40
""",
    )
)


# --------------------------------------------------------------------------
# Q20 shape: excess-share suppliers — suppliers holding an outsized share
# of some part's total shipped quantity (grouped subquery with a
# same-grain ratio threshold, then a semi join up to the supplier dim).
# --------------------------------------------------------------------------

def _excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_quantity")).alias("pair_qty")
    )
    # part grain derives from the pair grain (pair_qty is integer
    # micro-units, so the re-sum is exact; the pair grain already holds
    # one row per supplier, so count(*) IS the distinct supplier count)
    # — one lineitem scan, no count-distinct expand.
    per_part = per_pair.groupBy(F.col("l_partkey").alias("_pk")).agg(
        dsum(F.col("pair_qty")).alias("part_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    # scale-free threshold: a supplier shipping >2x its fair share
    # (1/n_supp) of the part's quantity — an absolute share cutoff
    # returns nothing once supplier counts grow with SF.
    hot = (
        per_pair.join(per_part, F.col("l_partkey") == F.col("_pk"))
        .filter(
            F.col("pair_qty") * F.col("n_supp") > 2.0 * F.col("part_qty")
        )
        .select("l_suppkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(hot, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )


_register(
    QuerySpec(
        name="excess_share_suppliers",
        survey_ids=("A2",),
        description="TPC-H Q20 shape: suppliers shipping >2x their fair "
        "share of some part's quantity — two-grain aggregate join "
        "feeding a semi join into the supplier dim",
        spark=_excess_share_suppliers,
        oracle=f"""
SELECT s_suppkey, s_name, n_name AS supp_nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT pp.l_suppkey
  FROM (
    SELECT l_partkey, l_suppkey, {osum('l_quantity')} AS pair_qty
    FROM lineitem GROUP BY l_partkey, l_suppkey
  ) pp
  JOIN (
    SELECT l_partkey, {osum('l_quantity')} AS part_qty,
           count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_partkey
  ) pt ON pp.l_partkey = pt.l_partkey
  WHERE pp.pair_qty * pt.n_supp > 2.0 * pt.part_qty
)
""",
    )
)


# --------------------------------------------------------------------------
# Q5 shape: local-supplier volume — the six-table join where supplier and
# customer must share a nation (the classic co-located-commerce query).
# Both nation sides and region are broadcast; the fact chain
# (customer⨝orders⨝lineitem⨝supplier) stays a shuffle join under AQE.
# --------------------------------------------------------------------------

def _local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _TS("1998-01-01 00:00:00"))
    )
    return (
        _t(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            _t(spark, sf_dir, "supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            # the Q5 signature: the supplier must sit in the CUSTOMER's
            # nation — an extra equi-condition, not a new join
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_register(
    QuerySpec(
        name="local_supplier_volume",
        survey_ids=("A2",),
        description="TPC-H Q5 shape: six-table join with the "
        "supplier-in-customer-nation equi-condition, region/nation dims "
        "broadcast, per-nation revenue",
        spark=_local_supplier_volume,
        oracle=f"""
SELECT n_name AS nation,
       {osum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    )
)


# --------------------------------------------------------------------------
# Q6 shape: the forecast-revenue-change scan — no join at all, one tight
# multi-predicate filter and a scalar aggregate.  Its value as a plan
# check: every predicate must reach the parquet scan (PushedFilters), and
# the aggregate is a pure partial/final pair over the pruned scan.
# --------------------------------------------------------------------------

def _forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "potential_revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


_register(
    QuerySpec(
        name="forecast_revenue_change",
        survey_ids=("A2", "F1"),
        description="TPC-H Q6 shape: joinless multi-predicate scan "
        "(date window, discount band, quantity cap) feeding one scalar "
        "aggregate — the predicate-pushdown benchmark query",
        spark=_forecast_revenue_change,
        oracle=f"""
SELECT {osum('l_extendedprice * l_discount')} AS potential_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
""",
    )
)


# --------------------------------------------------------------------------
# Q12 shape: priority split by line status — orders⨝lineitem with the
# conditional two-way count (CASE inside SUM).  The testdata carries no
# shipmode/commitdate columns, so the grouping axis is l_linestatus and
# the lateness predicate is a shipdate year window; the PLAN shape (fact
# join + conditional aggregate pivot) is exactly Q12's.
# --------------------------------------------------------------------------

def _priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _TS("1998-01-01 00:00:00"))
    )
    return (
        _t(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_register(
    QuerySpec(
        name="priority_by_linestatus",
        survey_ids=("A2",),
        description="TPC-H Q12 shape: orders⨝lineitem conditional "
        "two-way priority count per line status over a shipdate-year "
        "window (shipmode axis absent from the testdata; plan shape "
        "identical)",
        spark=_priority_by_linestatus,
        oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    )
)


# --------------------------------------------------------------------------
# Grouping sets / CUBE — a relational surface the reference lacks
# entirely (SURVEY §2.6: "no grouping sets / cube / rollup") and classic
# OLAP engines own natively.  The naive ``fact.cube(...)`` plans an
# Expand that fans EVERY fact row out to its 4 grouping combinations
# before the partial agg — measured 4.26 s settled at sf0.1.  The
# partial-rollup shape aggregates to the finest grouping FIRST (nation ×
# year ≈ 175 base cells) and cubes over those partials — sums of exact
# micro-unit decimals and counts re-aggregate losslessly, so the answer
# is bit-identical while the Expand touches 175 rows instead of 600k
# (measured 1.94 s settled; at 100 TB this is the difference between 4×
# the fact volume and 4× the cell count).  Rolled-up dimensions are emitted
# as 'ALL' labels rather than engine NULL-markers so the two engines
# hash identically.
# --------------------------------------------------------------------------


def _revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("rev"),
        )
    )
    # finest-grouping partials: exact integer micro-units, so cubing the
    # partials equals cubing the fact (dsum policy, re-aggregated)
    base = li.groupBy("nation", "o_year").agg(
        usum_dec(F.col("rev"), 1_000_000.0).alias("rev_u"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.cube("nation", "o_year")
        .agg(
            (F.sum("rev_u").cast("double") / 1_000_000.0).alias("revenue"),
            F.sum("n").alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("nation"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias(
                "o_year"
            ),
            "revenue",
            "n_rows",
        )
    )


_register(
    QuerySpec(
        name="revenue_cube",
        survey_ids=("A2", "A3"),
        description="CUBE(nation, order-year) revenue grouping sets over "
        "lineitem⨝orders⨝customer⨝nation: all four grouping combinations "
        "in one Expand + hash-agg pass, rolled-up dims labeled 'ALL'",
        spark=_revenue_cube,
        oracle=f"""
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS o_year,
       {osum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_rows
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE (n_name, year(o_orderdate))
""",
    )
)


def _revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region → nation → order-year): the hierarchy-drilldown
    twin of ``revenue_cube`` — 4 grouping levels {(r,n,y), (r,n), (r),
    ()} instead of the cube's full lattice.  Same partial-rollup
    physical shape: exact micro-unit partials at the finest grouping
    first, Expand over the ~175 base cells only."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev.alias("rev"),
        )
    )
    base = li.groupBy("region", "nation", "o_year").agg(
        usum_dec(F.col("rev"), 1_000_000.0).alias("rev_u"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.rollup("region", "nation", "o_year")
        .agg(
            (F.sum("rev_u").cast("double") / 1_000_000.0).alias("revenue"),
            F.sum("n").alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("region"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("nation"), F.lit("ALL")).alias("nation"),
            F.coalesce(F.col("o_year").cast("string"), F.lit("ALL")).alias(
                "o_year"
            ),
            "revenue",
            "n_rows",
        )
    )


_register(
    QuerySpec(
        name="revenue_rollup_hierarchy",
        survey_ids=("A2", "A3"),
        description="ROLLUP(region, nation, order-year) revenue hierarchy "
        "over the five-table join: the drilldown grouping-sets shape "
        "{(r,n,y),(r,n),(r),()} via the same partial-rollup physical "
        "plan as revenue_cube (Expand over base cells, never the fact)",
        spark=_revenue_rollup,
        oracle=f"""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS o_year,
       {osum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_rows
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name, year(o_orderdate))
""",
    )
)
