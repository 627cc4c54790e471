"""Behavioral analytics: sequential funnels and retention cohorts.

Two query shapes the engine did not own yet:

- **Funnel** — ordered-stage matching (view -> click -> purchase, each
  stage strictly after the previous) decorrelated into a chain of
  per-user conditional MIN aggregates and equi-joins on user_id.  Each
  stage is one hash aggregate + one join on the SAME key, so Catalyst
  reuses the user_id exchange across the whole chain — at 100 TB the
  funnel costs one shuffle of the filtered events, not one per stage.
- **Retention cohorts** — users bucketed by first-seen day, activity
  counted per (cohort, day-offset) cell: two hash aggregates and one
  equi-join, the standard cohort-matrix plan.

Determinism: stage timestamps are MINs (exact), counts are integers,
and the only derived value (mean hours to convert) goes through the
micro-unit fixed-point sum — nothing here can drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.plans.queries import (
    QuerySpec,
    _register,
    _t,
    dsum,
    osum,
)


# --------------------------------------------------------------------------
# Funnel: view -> click -> purchase, strictly ordered per user
# --------------------------------------------------------------------------

def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.first("t_view").alias("t_view"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    hours = dsum(
        (F.unix_micros(F.col("t_click")) - F.unix_micros(F.col("t_view")))
        / F.lit(3_600_000_000.0)
    )
    return (
        t1.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(
            t2.agg(
                F.count(F.lit(1)).alias("n_clicked"),
                hours.alias("sum_hours_view_to_click"),
            )
        )
        .crossJoin(t3.agg(F.count(F.lit(1)).alias("n_purchased")))
        .select(
            "n_viewed",
            "n_clicked",
            "n_purchased",
            (F.col("n_clicked") / F.col("n_viewed")).alias("click_rate"),
            (F.col("n_purchased") / F.col("n_clicked")).alias(
                "purchase_rate"
            ),
            (
                F.col("sum_hours_view_to_click") / F.col("n_clicked")
            ).alias("mean_hours_view_to_click"),
        )
    )


_register(
    QuerySpec(
        name="funnel_conversions",
        survey_ids=("A2", "D5"),
        description="ordered-stage funnel (view -> click -> purchase, "
        "each strictly later): per-user conditional-MIN chain reusing "
        "one user_id exchange; stage counts, rates, mean hours",
        spark=_funnel,
        oracle=f"""
WITH t1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t_click, min(t1.t_view) AS t_view
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM t1) AS n_viewed,
       (SELECT count(*) FROM t2) AS n_clicked,
       (SELECT count(*) FROM t3) AS n_purchased,
       (SELECT count(*) FROM t2) / CAST((SELECT count(*) FROM t1) AS DOUBLE)
         AS click_rate,
       (SELECT count(*) FROM t3) / CAST((SELECT count(*) FROM t2) AS DOUBLE)
         AS purchase_rate,
       (SELECT {osum('(epoch_us(t_click) - epoch_us(t_view)) / 3600000000.0')}
        FROM t2)
         / CAST((SELECT count(*) FROM t2) AS DOUBLE)
         AS mean_hours_view_to_click
""",
    )
)


# --------------------------------------------------------------------------
# Retention cohorts: first-seen day x activity-day offset
# --------------------------------------------------------------------------

def _retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            # string key: DATE values round-trip differently through the
            # two engines' result surfaces; the formatted day does not
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


_register(
    QuerySpec(
        name="retention_cohorts",
        survey_ids=("A2", "A3"),
        description="retention matrix: users cohorted by first-seen day, "
        "distinct actives per (cohort, day-offset) cell",
        spark=_retention,
        oracle="""
WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(d.day - f.cohort_day AS INT) AS day_offset,
       count(DISTINCT d.user_id) AS n_active
FROM d JOIN f ON d.user_id = f.user_id
GROUP BY f.cohort_day, day_offset
""",
    )
)


# --------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user,
# reported as a histogram (streak length -> users).  The island key is
# day - dense_rank (constant within a run of consecutive days) — the
# classic decomposition, all integer arithmetic.
# --------------------------------------------------------------------------

def _streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    days = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    longest = streaks.groupBy("user_id").agg(F.max("len").alias("best"))
    return (
        longest.groupBy(F.col("best").alias("streak_days"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_register(
    QuerySpec(
        name="activity_streaks",
        survey_ids=("A2", "D1"),
        description="gaps-and-islands: longest consecutive-day streak "
        "per user (day minus row_number island key), histogrammed",
        spark=_streaks,
        oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), islands AS (
  SELECT user_id,
         (day - DATE '1970-01-01')
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
), streaks AS (
  SELECT user_id, island, count(*) AS len
  FROM islands GROUP BY user_id, island
), longest AS (
  SELECT user_id, max(len) AS best FROM streaks GROUP BY user_id
)
SELECT best AS streak_days, count(*) AS n_users
FROM longest GROUP BY best
""",
    )
)


# --------------------------------------------------------------------------
# Point-in-interval attribution: each purchase attributed to the 30-min
# session that CONTAINS it.  The naive plan is a non-equi theta join
# (BroadcastNestedLoop at scale); the scale-correct shape used here
# buckets both sides by hour — sessions explode into the hour grid they
# span (bounded by session length), purchases join their own hour — so
# the containment check runs inside a plain equi-join on (user, hour).
# --------------------------------------------------------------------------

def _session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
        )
    )
    hour_us = 3_600_000_000
    spans = sessions.select(
        "user_id",
        "s_start",
        "s_end",
        "n_events",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("s_start") / hour_us).cast("long"),
                F.floor(F.unix_micros("s_end") / hour_us).cast("long"),
            )
        ).alias("hour_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
        F.floor(F.unix_micros("ts") / hour_us).cast("long").alias("hour_id"),
    )
    attributed = purchases.join(spans, ["user_id", "hour_id"]).filter(
        (F.col("p_ts") >= F.col("s_start")) & (F.col("p_ts") < F.col("s_end"))
    )
    return (
        attributed.groupBy("user_id", "s_start", "n_events")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(F.col("p_value")).alias("purchase_value"),
        )
    )


_register(
    QuerySpec(
        name="session_purchase_attribution",
        survey_ids=("A1", "A2"),
        description="point-in-interval join: purchases attributed to "
        "their containing 30-min session via hour-grid bucketing (equi-"
        "join carries the containment check; no nested-loop theta join)",
        spark=_session_attribution,
        oracle=f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type, value,
    CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_type, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
bounds AS (
  SELECT user_id, sid, min(ts) AS raw_start,
         max(ts) + INTERVAL 30 MINUTE AS s_end,
         count(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT b.user_id, b.raw_start AS s_start, b.n_events,
       count(*) AS n_purchases,
       {osum('s.value')} AS purchase_value
FROM sess s
JOIN bounds b ON s.user_id = b.user_id AND s.sid = b.sid
WHERE s.event_type = 'purchase'
GROUP BY b.user_id, b.raw_start, b.n_events
""",
    )
)


# --------------------------------------------------------------------------
# SCD2 history: purchase "state" intervals per user (valid_from/valid_to
# via lead, open-ended current row) — the slowly-changing-dimension
# construction every warehouse needs.
# --------------------------------------------------------------------------

def _scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return p.select(
        "user_id",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


_register(
    QuerySpec(
        name="user_state_scd2",
        survey_ids=("D1", "A2"),
        description="SCD2 interval construction: per-user purchase state "
        "with lead-derived valid_from/valid_to and an open current row",
        spark=_scd2,
        oracle="""
SELECT user_id, value AS state_value, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    )
)


# --------------------------------------------------------------------------
# Pivot: daily event counts widened to one column per type (fixed value
# list, so Catalyst compiles it to conditional aggregates — the same plan
# the oracle states explicitly).
# --------------------------------------------------------------------------

_TYPES = ("view", "click", "purchase", "signup", "error")


def _daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", list(_TYPES))
        .count()
    )
    return df.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _TYPES
        ],
    )


_register(
    QuerySpec(
        name="daily_type_pivot",
        survey_ids=("A3", "D5"),
        description="pivot: daily counts widened to one column per event "
        "type (fixed value list -> conditional-aggregate plan)",
        spark=_daily_pivot,
        oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       {cols}
FROM events GROUP BY day
""".format(
            cols=",\n       ".join(
                f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0"
                f" END) AS BIGINT) AS n_{t}"
                for t in _TYPES
            )
        ),
    )
)


# --------------------------------------------------------------------------
# Sliding distinct count: unique users per 1h window advancing every 15m.
# Spark explodes each event into its 4 windows before the distinct agg;
# the oracle states the same expansion as an offset cross join.
# --------------------------------------------------------------------------

def _sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_users")
    )


_register(
    QuerySpec(
        name="sliding_distinct_users",
        survey_ids=("A1", "A3"),
        description="distinct users per sliding window (1h every 15m): "
        "window expansion + distinct aggregation",
        spark=_sliding_distinct,
        oracle="""
SELECT make_timestamp(((epoch_ms(ts) // 900000) * 900000 - o.k * 900000)
         * 1000) AS window_start,
       count(DISTINCT user_id) AS n_users
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) o
GROUP BY window_start
""",
    )
)


# --------------------------------------------------------------------------
# Decile profile: ntile(10) over values per type, with each decile's
# bounds and fixed-point mean — the distribution-profile shape analysts
# reach for before histograms.
# --------------------------------------------------------------------------

def _value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            (dsum(F.col("value")) / F.count(F.lit(1))).alias("mean_value"),
        )
    )


_register(
    QuerySpec(
        name="value_deciles",
        survey_ids=("A2", "D1"),
        description="ntile(10) decile profile per type: bucket counts, "
        "bounds, fixed-point means (unique total order so both engines "
        "cut identical deciles)",
        spark=_value_deciles,
        oracle=f"""
WITH d AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS decile
  FROM events
)
SELECT event_type, decile, count(*) AS n,
       min(value) AS lo, max(value) AS hi,
       {osum('value')} / count(*) AS mean_value
FROM d GROUP BY event_type, decile
""",
    )
)


# --------------------------------------------------------------------------
# Declarative data-quality audit: the dbt-test shape — a battery of
# constraint checks (not-null, domain, range, uniqueness, referential
# integrity) evaluated as conditional aggregates, one violation-count row
# per rule.  Each fact table is scanned once; the FK checks are anti-join
# counts against broadcastable key sets.
# --------------------------------------------------------------------------

def _dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")

    def rule(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("rule"), F.col("n").cast("long").alias("violations")
        )

    li_scalar = li.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("q"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias("p"),
        F.sum(
            F.when(~F.col("l_discount").between(0.0, 1.0), 1).otherwise(0)
        ).alias("d"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).alias("rf"),
    )
    orphan = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n"))
    dup_line = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n"))
    )
    ev_null = ev.agg(
        F.sum(
            F.when(
                F.col("ts").isNull() | F.col("event_type").isNull(), 1
            ).otherwise(0)
        ).alias("n")
    )
    out = rule("lineitem_orphan_orderkey", orphan)
    out = out.unionByName(rule("lineitem_duplicate_linenumber", dup_line))
    out = out.unionByName(
        rule(
            "lineitem_nonpositive_quantity",
            li_scalar.select(F.col("q").alias("n")),
        )
    )
    out = out.unionByName(
        rule(
            "lineitem_negative_price",
            li_scalar.select(F.col("p").alias("n")),
        )
    )
    out = out.unionByName(
        rule(
            "lineitem_discount_out_of_range",
            li_scalar.select(F.col("d").alias("n")),
        )
    )
    out = out.unionByName(
        rule(
            "lineitem_bad_returnflag",
            li_scalar.select(F.col("rf").alias("n")),
        )
    )
    out = out.unionByName(rule("events_null_key_fields", ev_null))
    return out


_register(
    QuerySpec(
        name="dq_audit",
        survey_ids=("F4", "F5", "T7"),
        description="declarative data-quality audit: not-null, domain, "
        "range, uniqueness, and referential checks as one row of "
        "violation counts per rule (single scan per fact; anti-join FKs)",
        spark=_dq_audit,
        oracle="""
SELECT 'lineitem_orphan_orderkey' AS rule,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS violations
UNION ALL
SELECT 'lineitem_duplicate_linenumber',
       (SELECT CAST(coalesce(SUM(c - 1), 0) AS BIGINT) FROM (
          SELECT count(*) AS c FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
UNION ALL
SELECT 'lineitem_nonpositive_quantity',
       (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
UNION ALL
SELECT 'lineitem_negative_price',
       (SELECT count(*) FROM lineitem WHERE l_extendedprice < 0)
UNION ALL
SELECT 'lineitem_discount_out_of_range',
       (SELECT count(*) FROM lineitem
        WHERE l_discount NOT BETWEEN 0.0 AND 1.0)
UNION ALL
SELECT 'lineitem_bad_returnflag',
       (SELECT count(*) FROM lineitem
        WHERE l_returnflag NOT IN ('A', 'N', 'R'))
UNION ALL
SELECT 'events_null_key_fields',
       (SELECT count(*) FROM events
        WHERE ts IS NULL OR event_type IS NULL)
""",
    )
)


# --------------------------------------------------------------------------
# First-order Markov transitions: per-user event-type bigrams with
# transition probabilities — the behavioral "what happens next" matrix.
# --------------------------------------------------------------------------

def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    bi = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = bi.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy(F.col("from_type").alias("_f")).agg(
        F.sum("n").alias("row_total")
    )
    return (
        counts.join(totals, counts["from_type"] == F.col("_f"))
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("row_total").cast("double"))
            .alias("p"),
        )
    )


_register(
    QuerySpec(
        name="event_transitions",
        survey_ids=("A2", "D1"),
        description="first-order Markov matrix: per-user event-type "
        "bigram counts and transition probabilities",
        spark=_transitions,
        oracle="""
WITH bi AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM bi WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM counts
""",
    )
)


# --------------------------------------------------------------------------
# Change-point candidates by window contrast: trailing-24 vs leading-24
# fixed-point means; flag ticks where the level shift exceeds a
# threshold.  The non-recursive (hence SQL-expressible, hence
# oracle-checkable) cousin of CUSUM.
# --------------------------------------------------------------------------

def _mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n = 24
    base = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
    )
    wt = base.rowsBetween(-n, -1)
    wl = base.rowsBetween(1, n)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type",
        F.round(F.col("value") * 100.0).alias("v_c"),
    )
    df = (
        ev.withColumn("nt", F.count("v_c").over(wt))
        .withColumn("nl", F.count("v_c").over(wl))
        .withColumn("st", F.sum("v_c").over(wt))
        .withColumn("sl", F.sum("v_c").over(wl))
        .filter((F.col("nt") == n) & (F.col("nl") == n))
    )
    shift = (F.col("sl") / F.col("nl") - F.col("st") / F.col("nt")) / 100.0
    return df.select(
        "event_type",
        "ts",
        "event_id",
        shift.alias("level_shift"),
    ).filter(F.abs(F.col("level_shift")) > 25.0)


_register(
    QuerySpec(
        name="mean_shift_points",
        survey_ids=("A1", "D1"),
        description="change-point candidates: trailing-24 vs leading-24 "
        "exact centi-unit means, flagged where the level shift exceeds "
        "25 (the non-recursive, oracle-checkable CUSUM cousin)",
        spark=_mean_shift,
        oracle="""
WITH c AS (
  SELECT event_id, ts, event_type, round(value * 100.0) AS v_c
  FROM events
), s AS (
  SELECT event_type, ts, event_id,
         count(v_c) OVER wt AS nt, count(v_c) OVER wl AS nl,
         SUM(v_c) OVER wt AS st, SUM(v_c) OVER wl AS sl
  FROM c
  WINDOW wt AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
         wl AS (PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING)
)
SELECT event_type, ts, event_id,
       (sl / nl - st / nt) / 100.0 AS level_shift
FROM s
WHERE nt = 24 AND nl = 24
  AND abs((sl / nl - st / nt) / 100.0) > 25.0
""",
    )
)
