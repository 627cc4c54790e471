"""Technical-indicator suite over the tick stream (events as price series).

The reference stops at raw OHLCV persistence (crypto_collector.py:523-558);
any user of that collector computes indicators downstream.  This module owns
that downstream natively: VWAP, rolling volatility, Bollinger breakouts,
RSI, max drawdown, and cross-stream spread — each as one declarative
DataFrame expression the Catalyst optimizer can fuse with the scan
(column pruning + partition pruning reach the parquet reader).

Determinism policy (cross-engine hash parity with DuckDB):

- Every windowed/group sum runs over INTEGER-VALUED DOUBLES obtained by
  ``round(x * unit)`` (centi-units for prices, milli-units for returns).
  Integer-valued doubles below 2^53 sum exactly in ANY accumulation order,
  so Spark's hash-agg / window partial order and DuckDB's segment-tree
  order produce identical bits.  Magnitude audit: price centi-units
  <= 6e4 (value <= 560.21 at sf0.1), squares <= 3.2e9, 24-row sums
  <= 8e10 — far under 2^53.  Returns are winsorized to [-100, 100]
  (standard realized-vol practice) so milli-unit squares stay <= 1e10.
- Everything AFTER the sums is ordinary double arithmetic on inputs that
  are already bit-identical across engines, written with the same
  expression shape on both sides — deterministic because IEEE ops are.
- ``sqrt`` is correctly rounded per IEEE-754 in both engines (unlike
  ln/exp/pow, which this module deliberately avoids).
- Row windows are totally ordered by (ts, event_id): event_id is unique,
  so frame membership can never differ between engines.

Scale notes (100 TB): every query is a per-key window or hash aggregate —
one shuffle on event_type (or none when the lake is already bucketed by
type), no self-joins, no driver state.  The cross-stream spread join is an
equi-join on the time bucket, co-partitioned with both aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.functions.exactsum import lsum_dec
from crypto_data_ingestion_module_spark.plans.queries import (
    QuerySpec,
    _register,
    _t,
    dsum,
    obucket,
    osum,
)


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tick stream with only the indicator-relevant columns.

    Explicit select so the parquet scan prunes ``props``/``user_id``
    (ReadSchema carries 4 of 6 columns).
    """
    return _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )


_ORD = ["ts", "event_id"]  # unique total order within an event_type


def _w_trail(n: int):
    return (
        Window.partitionBy("event_type")
        .orderBy(*_ORD)
        .rowsBetween(-(n - 1), 0)
    )


_O_ORD = "ORDER BY ts, event_id"


def _o_trail(n: int) -> str:
    return (
        f"PARTITION BY event_type {_O_ORD} "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"
    )


# --------------------------------------------------------------------------
# VWAP: volume-weighted average price per (type, 1h bucket).  Volume is the
# JSON ``props.k`` field — exercising JSON extraction in the hot path
# (get_json_object is JVM-side codegen, not a UDF).
# --------------------------------------------------------------------------

def _vwap_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        "value",
        F.get_json_object(F.col("props"), "$.k").cast("double").alias("qty"),
    )
    agg = (
        ev.groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            dsum(F.col("qty")).alias("volume"),
            dsum(F.col("value") * F.col("qty")).alias("turnover"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n_trades",
            "volume",
            (
                F.when(
                    F.col("volume") > 0,
                    F.col("turnover") / F.col("volume"),
                ).otherwise(F.lit(None).cast("double"))
            ).alias("vwap"),
        )
    )
    return agg


_register(
    QuerySpec(
        name="vwap_1h",
        survey_ids=("A1", "A2"),
        description="volume-weighted average price per 1h bucket; volume "
        "parsed from the JSON props column JVM-side (no UDF)",
        spark=_vwap_1h,
        oracle=f"""
SELECT {obucket('ts', 3_600_000)} AS bucket_start,
       event_type,
       count(*) AS n_trades,
       {osum("CAST(json_extract_string(props, '$.k') AS DOUBLE)")} AS volume,
       CASE WHEN {osum("CAST(json_extract_string(props, '$.k') AS DOUBLE)")} > 0
            THEN {osum("value * CAST(json_extract_string(props, '$.k') AS DOUBLE)")}
                 / {osum("CAST(json_extract_string(props, '$.k') AS DOUBLE)")}
            ELSE NULL END AS vwap
FROM events
GROUP BY bucket_start, event_type
""",
    )
)


# --------------------------------------------------------------------------
# Rolling realized volatility: stddev of winsorized simple returns over a
# trailing 24-tick frame per type.
# --------------------------------------------------------------------------

def _ret_milli() -> Column:
    """Winsorized simple return in exact milli-units (integer-valued dbl).

    The clamp sits INSIDE the null guard: least/greatest skip NULL in
    both Spark and DuckDB, so clamping a NULL return would fabricate a
    +100 "return" on the first tick of every series.
    """
    prev = F.lag("value").over(Window.partitionBy("event_type").orderBy(*_ORD))
    ret = (F.col("value") - prev) / prev
    clamped = F.greatest(F.least(ret, F.lit(100.0)), F.lit(-100.0))
    return F.round(F.when(prev > 0, clamped) * 1000.0)


def _rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w_trail(24)
    df = _series(spark, sf_dir).withColumn("ret_m", _ret_milli())
    # materialize each window aggregate ONCE: referencing the window
    # expressions directly inside var_m re-expanded them per reference
    # (the physical plan carried count(ret_m) x4 and sum(ret_m) x2 across
    # two Window execs — the r5 1.05 -> 1.4 s regression); as columns,
    # Catalyst collapses all three into one Window exec pass.
    df = (
        df.withColumn("n", F.count("ret_m").over(w))  # non-null returns
        .withColumn("s1", F.sum("ret_m").over(w))
        .withColumn("s2", F.sum(F.col("ret_m") * F.col("ret_m")).over(w))
    )
    # sample variance in milli^2; all inputs integer-valued doubles, so the
    # expression evaluates to identical bits in both engines.
    var_m = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("n") * (F.col("n") - 1)
    )
    return (
        df.withColumn("var_m", var_m)
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.when(F.col("n") >= 2, F.sqrt(F.col("var_m")) / 1000.0)
            .otherwise(F.lit(None).cast("double"))
            .alias("volatility"),
            F.col("n").alias("n_returns"),
        )
    )


_register(
    QuerySpec(
        name="rolling_volatility_24",
        survey_ids=("A1", "D1"),
        description="trailing-24-tick realized volatility of winsorized "
        "simple returns, exact under any aggregation order",
        spark=_rolling_volatility,
        oracle=f"""
WITH r AS (
  SELECT event_id, event_type, ts, value,
         round(CASE WHEN lag(value) OVER
                 (PARTITION BY event_type {_O_ORD}) > 0
               THEN greatest(least(
                 (value - lag(value) OVER (PARTITION BY event_type {_O_ORD}))
                    / lag(value) OVER (PARTITION BY event_type {_O_ORD}),
                 100.0), -100.0)
               END * 1000.0) AS ret_m
  FROM events
), s AS (
  SELECT event_id, event_type, ts, value,
         count(ret_m) OVER w AS n,
         sum(ret_m) OVER w AS s1,
         sum(ret_m * ret_m) OVER w AS s2
  FROM r
  WINDOW w AS ({_o_trail(24)})
)
SELECT event_id, event_type, ts, value,
       CASE WHEN n >= 2
            THEN sqrt((n * s2 - s1 * s1) / (n * (n - 1))) / 1000.0
            ELSE NULL END AS volatility,
       n AS n_returns
FROM s
""",
    )
)


# --------------------------------------------------------------------------
# Bollinger breakouts: trailing-20 MA +/- 2 sigma band, flag escapes.
# --------------------------------------------------------------------------

def _bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w_trail(20)
    df = _series(spark, sf_dir).withColumn(
        "v_c", F.round(F.col("value") * 100.0)  # exact centi-units
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("v_c").over(w)
    s2 = F.sum(F.col("v_c") * F.col("v_c")).over(w)
    df = (
        df.withColumn("n", n)
        .withColumn("ma_c", s1 / n)
        .withColumn(
            "sd_c",
            F.when(
                F.col("n") >= 2,
                F.sqrt((n * s2 - s1 * s1) / (n * (n - 1))),
            ),
        )
    )
    return df.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        (F.col("ma_c") / 100.0).alias("ma20"),
        (F.col("sd_c") / 100.0).alias("sd20"),
        F.when(
            F.col("sd_c").isNotNull(),
            (F.col("v_c") - F.col("ma_c")) > 2.0 * F.col("sd_c"),
        )
        .otherwise(F.lit(None).cast("boolean"))
        .alias("above_band"),
        F.when(
            F.col("sd_c").isNotNull(),
            (F.col("ma_c") - F.col("v_c")) > 2.0 * F.col("sd_c"),
        )
        .otherwise(F.lit(None).cast("boolean"))
        .alias("below_band"),
    )


_register(
    QuerySpec(
        name="bollinger_breakouts_20",
        survey_ids=("A1", "D1"),
        description="trailing-20 Bollinger band (MA +/- 2 sigma) with "
        "above/below breakout flags",
        spark=_bollinger,
        oracle=f"""
WITH c AS (
  SELECT event_id, event_type, ts, value, round(value * 100.0) AS v_c
  FROM events
), s AS (
  SELECT event_id, event_type, ts, value, v_c,
         count(*) OVER w AS n,
         sum(v_c) OVER w AS s1,
         sum(v_c * v_c) OVER w AS s2
  FROM c
  WINDOW w AS ({_o_trail(20)})
), b AS (
  SELECT event_id, event_type, ts, value, v_c, n,
         s1 / n AS ma_c,
         CASE WHEN n >= 2
              THEN sqrt((n * s2 - s1 * s1) / (n * (n - 1))) END AS sd_c
  FROM s
)
SELECT event_id, event_type, ts, value,
       ma_c / 100.0 AS ma20,
       sd_c / 100.0 AS sd20,
       CASE WHEN sd_c IS NOT NULL
            THEN (v_c - ma_c) > 2.0 * sd_c END AS above_band,
       CASE WHEN sd_c IS NOT NULL
            THEN (ma_c - v_c) > 2.0 * sd_c END AS below_band
FROM b
""",
    )
)


# --------------------------------------------------------------------------
# RSI(14): SMA variant (Cutler's RSI) — SQL-expressible, no recursion.
# --------------------------------------------------------------------------

def _rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    wl = Window.partitionBy("event_type").orderBy(*_ORD)
    w = _w_trail(14)
    df = _series(spark, sf_dir).withColumn(
        "diff_c",
        F.round(F.col("value") * 100.0)
        - F.round(F.lag("value").over(wl) * 100.0),
    )
    gain = F.sum(F.greatest(F.col("diff_c"), F.lit(0.0))).over(w)
    loss = F.sum(F.greatest(-F.col("diff_c"), F.lit(0.0))).over(w)
    n = F.count("diff_c").over(w)
    df = (
        df.withColumn("n", n)
        .withColumn("gain_c", gain)
        .withColumn("loss_c", loss)
    )
    rsi = F.when(F.col("n") < 14, F.lit(None).cast("double")).otherwise(
        F.when(F.col("loss_c") == 0.0, F.lit(100.0)).otherwise(
            100.0 - 100.0 / (1.0 + F.col("gain_c") / F.col("loss_c"))
        )
    )
    return df.select(
        "event_id", "event_type", "ts", "value", rsi.alias("rsi14")
    )


_register(
    QuerySpec(
        name="rsi_14",
        survey_ids=("A1", "D1"),
        description="Cutler's RSI over a trailing 14-tick frame (SMA of "
        "centi-unit gains/losses; exact window sums)",
        spark=_rsi,
        oracle=f"""
WITH d AS (
  SELECT event_id, event_type, ts, value,
         round(value * 100.0)
           - round(lag(value) OVER (PARTITION BY event_type {_O_ORD}) * 100.0)
           AS diff_c
  FROM events
), s AS (
  SELECT event_id, event_type, ts, value,
         count(diff_c) OVER w AS n,
         sum(greatest(diff_c, 0.0)) OVER w AS gain_c,
         sum(greatest(-diff_c, 0.0)) OVER w AS loss_c
  FROM d
  WINDOW w AS ({_o_trail(14)})
)
SELECT event_id, event_type, ts, value,
       CASE WHEN n < 14 THEN NULL
            WHEN loss_c = 0.0 THEN 100.0
            ELSE 100.0 - 100.0 / (1.0 + gain_c / loss_c) END AS rsi14
FROM s
""",
    )
)


# --------------------------------------------------------------------------
# Max drawdown per type: running peak -> per-type worst drawdown.  Pure
# max/count aggregates, no floating sums at all.
# --------------------------------------------------------------------------

def _max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    wrun = (
        Window.partitionBy("event_type")
        .orderBy(*_ORD)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    df = _series(spark, sf_dir).withColumn(
        "peak", F.max("value").over(wrun)
    )
    dd = F.when(
        F.col("peak") > 0, (F.col("peak") - F.col("value")) / F.col("peak")
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("dd", dd)
        .groupBy("event_type")
        .agg(
            F.max("dd").alias("max_drawdown"),
            F.max("peak").alias("all_time_high"),
            F.sum(
                F.when(F.col("value") == F.col("peak"), 1).otherwise(0)
            ).alias("n_new_highs"),
        )
    )


_register(
    QuerySpec(
        name="max_drawdown",
        survey_ids=("A2", "D1"),
        description="per-type maximum drawdown from the running peak "
        "(order-exact: max/compare only, no float accumulation)",
        spark=_max_drawdown,
        oracle=f"""
WITH p AS (
  SELECT event_type, value,
         max(value) OVER (PARTITION BY event_type {_O_ORD}
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM events
)
SELECT event_type,
       max(CASE WHEN peak > 0 THEN (peak - value) / peak ELSE 0.0 END)
         AS max_drawdown,
       max(peak) AS all_time_high,
       CAST(sum(CASE WHEN value = peak THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_highs
FROM p
GROUP BY event_type
""",
    )
)


# --------------------------------------------------------------------------
# Cross-stream spread: hourly fixed-point means of two streams, equi-joined
# on the bucket — the arbitrage-monitor shape (venue A vs venue B price).
# --------------------------------------------------------------------------

def _hourly_mean(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    return (
        _series(spark, sf_dir)
        .filter(F.col("event_type") == etype)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(
            (dsum(F.col("value")) / F.count(F.lit(1))).alias("mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(F.col("w.start").alias("bucket_start"), "mean", "n")
    )


def _cross_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _hourly_mean(spark, sf_dir, "view").withColumnsRenamed(
        {"mean": "mean_view", "n": "n_view"}
    )
    b = _hourly_mean(spark, sf_dir, "click").withColumnsRenamed(
        {"mean": "mean_click", "n": "n_click"}
    )
    j = a.join(b, "bucket_start")
    return j.select(
        "bucket_start",
        "mean_view",
        "mean_click",
        "n_view",
        "n_click",
        (F.col("mean_view") - F.col("mean_click")).alias("spread"),
        F.when(
            F.col("mean_click") > 0,
            (F.col("mean_view") - F.col("mean_click")) / F.col("mean_click"),
        ).alias("spread_pct"),
    )


_register(
    QuerySpec(
        name="cross_stream_spread_1h",
        survey_ids=("A2", "D5"),
        description="hourly spread between two streams (arbitrage-monitor "
        "shape): fixed-point means equi-joined on the time bucket",
        spark=_cross_spread,
        oracle=f"""
WITH a AS (
  SELECT {obucket('ts', 3_600_000)} AS bucket_start,
         {osum('value')} / count(*) AS mean_view, count(*) AS n_view
  FROM events WHERE event_type = 'view' GROUP BY 1
), b AS (
  SELECT {obucket('ts', 3_600_000)} AS bucket_start,
         {osum('value')} / count(*) AS mean_click, count(*) AS n_click
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT a.bucket_start, mean_view, mean_click, n_view, n_click,
       mean_view - mean_click AS spread,
       CASE WHEN mean_click > 0
            THEN (mean_view - mean_click) / mean_click END AS spread_pct
FROM a JOIN b ON a.bucket_start = b.bucket_start
""",
    )
)


# --------------------------------------------------------------------------
# TWAP: time-weighted average price per (type, 1h bucket).  Each tick is
# weighted by its holding time — the seconds until the next tick in the
# SAME bucket (the final holding period of a bucket ends at the bucket
# edge, so buckets partition time exactly).
# --------------------------------------------------------------------------

def _twap_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _series(spark, sf_dir).withColumn(
        "bucket_start", F.window(F.col("ts"), "1 hour")["start"]
    )
    nxt = F.lead(F.unix_micros(F.col("ts"))).over(
        Window.partitionBy("event_type", "bucket_start").orderBy(*_ORD)
    )
    bucket_end = F.unix_micros(F.col("bucket_start")) + F.lit(
        3_600_000_000
    ).cast("long")
    hold_us = F.coalesce(nxt, bucket_end) - F.unix_micros(F.col("ts"))
    df = df.withColumn("hold_us", hold_us)
    return (
        df.groupBy("bucket_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("hold_us").alias("covered_us"),
            # price x micros: price has >= centi precision, hold_us is an
            # exact long; the per-row product (≤ price_cents · 3.6e9 µs ≈
            # 2^49) sums on the split-long fast path (functions.exactsum;
            # high-limb headroom ≥ 2^34 rows per (bucket, type) group).
            lsum_dec(
                (F.round(F.col("value") * 100.0) * F.col("hold_us")).cast(
                    "long"
                )
            ).alias("pt_c_us"),
        )
        .select(
            "bucket_start",
            "event_type",
            "n_ticks",
            (
                F.col("pt_c_us").cast("double")
                / F.col("covered_us").cast("double")
                / 100.0
            ).alias("twap"),
        )
    )


_register(
    QuerySpec(
        name="twap_1h",
        survey_ids=("A1", "A2"),
        description="time-weighted average price per 1h bucket: each tick "
        "weighted by its exact holding micros (lead within bucket, last "
        "tick holds to the bucket edge)",
        spark=_twap_1h,
        oracle=f"""
WITH b AS (
  SELECT event_id, event_type, ts, value,
         {obucket('ts', 3_600_000)} AS bucket_start
  FROM events
), h AS (
  SELECT event_type, bucket_start, value,
         coalesce(
           lead(epoch_us(ts)) OVER (PARTITION BY event_type, bucket_start
                                    {_O_ORD}),
           epoch_us(bucket_start) + 3600000000
         ) - epoch_us(ts) AS hold_us
  FROM b
)
SELECT bucket_start, event_type, count(*) AS n_ticks,
       CAST(SUM(CAST(round(value * 100.0) * hold_us AS DECIMAL(38,0)))
            AS DOUBLE)
         / CAST(SUM(hold_us) AS DOUBLE) / 100.0 AS twap
FROM h
GROUP BY bucket_start, event_type
""",
    )
)


# --------------------------------------------------------------------------
# Tick-rule order flow: classify each tick buy/sell by the sign of the
# price change (carrying the last nonzero sign through flats via a
# last_value window), net signed flow per (type, 1h bucket).
# --------------------------------------------------------------------------

def _order_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    wl = Window.partitionBy("event_type").orderBy(*_ORD)
    df = _series(spark, sf_dir).withColumn(
        "diff_c",
        F.round(F.col("value") * 100.0)
        - F.round(F.lag("value").over(wl) * 100.0),
    )
    sign = F.when(F.col("diff_c") > 0, 1).when(F.col("diff_c") < 0, -1)
    df = df.withColumn("sgn_raw", sign)
    # carry the last nonzero sign through zero-change ticks (the tick
    # rule); ignoreNulls last_value is order-exact over the row frame
    carried = F.last("sgn_raw", ignorenulls=True).over(
        wl.rowsBetween(Window.unboundedPreceding, 0)
    )
    df = df.withColumn("sgn", F.coalesce(carried, F.lit(0)))
    return (
        df.withColumn(
            "bucket_start", F.window(F.col("ts"), "1 hour")["start"]
        )
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("sgn").alias("net_flow"),
            F.sum(F.when(F.col("sgn") > 0, 1).otherwise(0)).alias("n_buys"),
            F.sum(F.when(F.col("sgn") < 0, 1).otherwise(0)).alias("n_sells"),
        )
    )


_register(
    QuerySpec(
        name="order_flow_1h",
        survey_ids=("A1", "D1"),
        description="tick-rule order flow: buy/sell classification by "
        "carried price-change sign, net signed flow per 1h bucket",
        spark=_order_flow,
        oracle=f"""
WITH d AS (
  SELECT event_id, event_type, ts, value,
         round(value * 100.0)
           - round(lag(value) OVER (PARTITION BY event_type {_O_ORD}) * 100.0)
           AS diff_c
  FROM events
), s AS (
  SELECT event_id, event_type, ts,
         CASE WHEN diff_c > 0 THEN 1 WHEN diff_c < 0 THEN -1 END AS sgn_raw
  FROM d
), c AS (
  SELECT event_type, ts, event_id,
         coalesce(last_value(sgn_raw IGNORE NULLS) OVER (
           PARTITION BY event_type {_O_ORD}
           ROWS UNBOUNDED PRECEDING), 0) AS sgn
  FROM s
)
SELECT {obucket('ts', 3_600_000)} AS bucket_start, event_type,
       CAST(sum(sgn) AS BIGINT) AS net_flow,
       CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_buys,
       CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sells
FROM c
GROUP BY bucket_start, event_type
""",
    )
)


# --------------------------------------------------------------------------
# Amihud illiquidity: per (type, day) mean of |return| / dollar volume —
# the classic price-impact proxy, entirely fixed-point.
# --------------------------------------------------------------------------

def _amihud(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.get_json_object(F.col("props"), "$.k").cast("double").alias("qty"),
    )
    df = ev.withColumn("ret_m", _ret_milli()).withColumn(
        "dollar_u",
        F.round(F.col("value") * F.col("qty") * 100.0),  # centi-units
    )
    per_tick = F.when(
        F.col("dollar_u") > 0,
        F.abs(F.col("ret_m")) / F.col("dollar_u"),
    )
    return (
        df.withColumn("impact", per_tick)
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count("impact").alias("n_ticks"),
            (dsum(F.col("impact")) / F.count("impact")).alias(
                "amihud_illiq"
            ),
        )
    )


_register(
    QuerySpec(
        name="amihud_illiquidity",
        survey_ids=("A2", "A3"),
        description="Amihud price-impact proxy: daily mean |return| per "
        "dollar volume (milli-unit returns over centi-unit turnover)",
        spark=_amihud,
        oracle=f"""
WITH r AS (
  SELECT event_id, event_type, ts, value,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS qty,
         round(CASE WHEN lag(value) OVER
                 (PARTITION BY event_type {_O_ORD}) > 0
               THEN greatest(least(
                 (value - lag(value) OVER (PARTITION BY event_type {_O_ORD}))
                    / lag(value) OVER (PARTITION BY event_type {_O_ORD}),
                 100.0), -100.0)
               END * 1000.0) AS ret_m
  FROM events
), i AS (
  SELECT event_type, ts,
         CASE WHEN round(value * qty * 100.0) > 0
              THEN abs(ret_m) / round(value * qty * 100.0) END AS impact
  FROM r
)
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(impact) AS n_ticks,
       {osum('impact')} / count(impact) AS amihud_illiq
FROM i
GROUP BY day, event_type
""",
    )
)


# --------------------------------------------------------------------------
# Mergeable value histogram: per (type, 1h bucket), fixed 50-wide bins.
# Integer bin counts are the associative partial form of any quantile /
# distribution question — the histogram lake is cascade-able exactly like
# the candle partials.
# --------------------------------------------------------------------------

_BIN_W = 50.0
_N_BINS = 12


def _value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _series(spark, sf_dir)
    bin_id = F.least(
        F.floor(F.col("value") / _BIN_W), F.lit(_N_BINS - 1)
    ).cast("int")
    return (
        df.withColumn(
            "bucket_start", F.window(F.col("ts"), "1 hour")["start"]
        )
        .groupBy("bucket_start", "event_type", bin_id.alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_register(
    QuerySpec(
        name="value_histogram_1h",
        survey_ids=("A1", "A3"),
        description="mergeable per-bucket value histogram (12 fixed "
        "50-wide bins, top bin open): the associative partial form of "
        "distribution queries",
        spark=_value_histogram,
        oracle=f"""
SELECT {obucket('ts', 3_600_000)} AS bucket_start, event_type,
       CAST(least(floor(value / {_BIN_W}), {_N_BINS - 1}) AS INT) AS bin_id,
       count(*) AS n
FROM events
GROUP BY bucket_start, event_type, bin_id
""",
    )
)


# --------------------------------------------------------------------------
# Gap-filled close series: generate the full 15m grid per type between its
# first and last bucket, left-join real closes, carry the last close
# forward.  The dense-grid output downstream models expect (candle_gaps
# only DETECTS holes; this repairs them).
# --------------------------------------------------------------------------

def _gap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivl = "15 minutes"
    closes = (
        _series(spark, sf_dir)
        .groupBy(
            F.window("ts", ivl)["start"].alias("bucket_ts"), "event_type"
        )
        .agg(
            F.max(
                F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
            )["value"].alias("close")
        )
    )
    grid = (
        closes.groupBy("event_type")
        .agg(F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr(f"INTERVAL {ivl}"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(closes, ["event_type", "bucket_ts"], "left")
        .withColumn("is_gap", F.col("close").isNull())
        .withColumn("close_filled", F.last("close", ignorenulls=True).over(w))
        .select("event_type", "bucket_ts", "close_filled", "is_gap")
    )


_register(
    QuerySpec(
        name="candles_gap_filled",
        survey_ids=("A1", "D1"),
        description="dense 15m close series: full per-type grid between "
        "first and last bucket, holes forward-filled from the last close",
        spark=_gap_filled,
        oracle=f"""
WITH c AS (
  SELECT {obucket('ts', 900_000)} AS bucket_ts, event_type, value,
         row_number() OVER (PARTITION BY {obucket('ts', 900_000)}, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), closes AS (
  SELECT bucket_ts, event_type, value AS close FROM c WHERE rn = 1
), grid AS (
  SELECT event_type,
         unnest(generate_series(min(bucket_ts), max(bucket_ts),
                                INTERVAL 15 MINUTE)) AS bucket_ts
  FROM closes GROUP BY event_type
)
SELECT g.event_type, g.bucket_ts,
       last_value(cl.close IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket_ts
         ROWS UNBOUNDED PRECEDING) AS close_filled,
       cl.close IS NULL AS is_gap
FROM grid g
LEFT JOIN closes cl
  ON cl.event_type = g.event_type AND cl.bucket_ts = g.bucket_ts
""",
    )
)


# --------------------------------------------------------------------------
# Cross-stream Pearson correlation over hourly micro-unit totals (the
# BTC-vs-ETH correlation matrix shape).  The five accumulators are exact:
# totals are integer-valued doubles, their pairwise products go through
# DECIMAL, and the final corr combines identical bits identically.
# --------------------------------------------------------------------------

def _pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        _series(spark, sf_dir)
        .groupBy(
            F.window("ts", "1 hour")["start"].alias("bucket_ts"),
            "event_type",
        )
        .agg(
            F.sum(F.round(F.col("value") * 1_000_000.0)).alias("s_u")
        )
    )
    a = hourly.select(
        F.col("bucket_ts").alias("b"),
        F.col("event_type").alias("type_a"),
        F.col("s_u").alias("x"),
    )
    bb = hourly.select(
        F.col("bucket_ts").alias("b"),
        F.col("event_type").alias("type_b"),
        F.col("s_u").alias("y"),
    )
    dec = lambda c: c.cast("decimal(18,0)")  # noqa: E731
    j = a.join(bb, "b").filter(F.col("type_a") < F.col("type_b"))
    agg = j.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sx2"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("sy2"),
    )
    # combine the moments ENTIRELY in decimal (exact integers), convert
    # each final term to double exactly once: a mixed double chain left
    # a 1-ulp cross-engine drift at sf0.01
    nd = F.col("n_buckets").cast("decimal(12,0)")
    sxd = F.col("sx").cast("decimal(18,0)")
    syd = F.col("sy").cast("decimal(18,0)")
    num = (nd * F.col("sxy") - sxd * syd).cast("double")
    varx = (nd * F.col("sx2") - sxd * sxd).cast("double")
    vary = (nd * F.col("sy2") - syd * syd).cast("double")
    den = F.sqrt(varx) * F.sqrt(vary)
    return agg.select(
        "type_a",
        "type_b",
        "n_buckets",
        F.when(den > 0, num / den).alias("pearson_r"),
    )


_register(
    QuerySpec(
        name="stream_pair_correlation",
        survey_ids=("A2", "D5"),
        description="pairwise Pearson correlation of hourly micro-unit "
        "totals across all stream pairs (decimal-exact accumulators, "
        "identical-bits combine)",
        spark=_pair_correlation,
        oracle=f"""
WITH h AS (
  SELECT {obucket('ts', 3_600_000)} AS b, event_type,
         SUM(round(value * 1000000.0)) AS s_u
  FROM events GROUP BY b, event_type
), p AS (
  SELECT a.b, a.event_type AS type_a, bb.event_type AS type_b,
         CAST(a.s_u AS HUGEINT) AS x, CAST(bb.s_u AS HUGEINT) AS y
  FROM h a JOIN h bb ON a.b = bb.b AND a.event_type < bb.event_type
), agg AS (
  SELECT type_a, type_b, count(*) AS n_buckets,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM p GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_buckets,
       CASE WHEN sqrt(CAST(n_buckets * sx2 - sx * sx AS DOUBLE))
                 * sqrt(CAST(n_buckets * sy2 - sy * sy AS DOUBLE)) > 0
            THEN CAST(n_buckets * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n_buckets * sx2 - sx * sx AS DOUBLE))
                    * sqrt(CAST(n_buckets * sy2 - sy * sy AS DOUBLE)))
       END AS pearson_r
FROM agg
""",
    )
)


# --------------------------------------------------------------------------
# Hour-of-day seasonality profile: the intraday activity/price shape.
# --------------------------------------------------------------------------

def _seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _series(spark, sf_dir)
        .groupBy(F.hour("ts").alias("hour_of_day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (dsum(F.col("value")) / F.count(F.lit(1))).alias("mean_value"),
        )
    )


_register(
    QuerySpec(
        name="hourly_seasonality",
        survey_ids=("A2", "A3"),
        description="intraday seasonality: event count and fixed-point "
        "mean value per (hour-of-day, type)",
        spark=_seasonality,
        oracle=f"""
SELECT hour(ts) AS hour_of_day, event_type,
       count(*) AS n_events,
       {osum('value')} / count(*) AS mean_value
FROM events
GROUP BY hour_of_day, event_type
""",
    )
)


# --------------------------------------------------------------------------
# Candlestick patterns over the 1h resample: doji, bullish/bearish
# engulfing (needs the lagged candle), hammer — counted per type.  Pure
# comparisons on exact OHLC values (2-decimal doubles, differences and
# small multiples exact), so detection is engine-deterministic.
# --------------------------------------------------------------------------

def _candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_data_ingestion_module_spark.plans.queries import _flagship

    candles = _flagship(spark, sf_dir, 3_600_000)
    wl = Window.partitionBy("event_type").orderBy("bucket_ts")
    df = (
        candles.withColumn("p_open", F.lag("open").over(wl))
        .withColumn("p_close", F.lag("close").over(wl))
    )
    body = F.abs(F.col("close") - F.col("open"))
    doji = body * 10.0 <= (F.col("high") - F.col("low"))
    bull_engulf = (
        F.col("p_close").isNotNull()
        & (F.col("p_close") < F.col("p_open"))
        & (F.col("close") > F.col("open"))
        & (F.col("open") <= F.col("p_close"))
        & (F.col("close") >= F.col("p_open"))
    )
    bear_engulf = (
        F.col("p_close").isNotNull()
        & (F.col("p_close") > F.col("p_open"))
        & (F.col("close") < F.col("open"))
        & (F.col("open") >= F.col("p_close"))
        & (F.col("close") <= F.col("p_open"))
    )
    hammer = (
        (F.least("open", "close") - F.col("low") >= 2.0 * body)
        & (F.col("high") - F.greatest("open", "close") <= body)
    )
    return df.groupBy("event_type").agg(
        F.sum(F.when(doji, 1).otherwise(0)).alias("n_doji"),
        F.sum(F.when(bull_engulf, 1).otherwise(0)).alias("n_bull_engulf"),
        F.sum(F.when(bear_engulf, 1).otherwise(0)).alias("n_bear_engulf"),
        F.sum(F.when(hammer, 1).otherwise(0)).alias("n_hammer"),
        F.count(F.lit(1)).alias("n_candles"),
    )


_register(
    QuerySpec(
        name="candlestick_patterns",
        survey_ids=("A1", "D1"),
        description="candlestick pattern counts per type over the 1h "
        "resample: doji, bullish/bearish engulfing (lagged candle), "
        "hammer — exact-value comparisons only",
        spark=_candle_patterns,
        oracle="""
WITH dedup AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, ts
                                 ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
), candles AS (
  SELECT make_timestamp(((epoch_ms(ts) // 3600000) * 3600000) * 1000)
           AS bucket_ts,
         event_type,
         arg_min(value, ts) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, ts) AS close
  FROM dedup GROUP BY bucket_ts, event_type
), lagged AS (
  SELECT *, lag(open) OVER w AS p_open, lag(close) OVER w AS p_close
  FROM candles
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
)
SELECT event_type,
  CAST(SUM(CASE WHEN abs(close - open) * 10.0 <= high - low
           THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
  CAST(SUM(CASE WHEN p_close IS NOT NULL AND p_close < p_open
            AND close > open AND open <= p_close AND close >= p_open
           THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
  CAST(SUM(CASE WHEN p_close IS NOT NULL AND p_close > p_open
            AND close < open AND open >= p_close AND close <= p_open
           THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf,
  CAST(SUM(CASE WHEN least(open, close) - low >= 2.0 * abs(close - open)
            AND high - greatest(open, close) <= abs(close - open)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer,
  count(*) AS n_candles
FROM lagged GROUP BY event_type
""",
    )
)


# --------------------------------------------------------------------------
# 3-sigma outliers: per-type exact moments (centi-unit integer sums, the
# Bollinger machinery at GROUP grain) broadcast back onto the stream; flag
# and z-score every tick.  One hash aggregate + one broadcast join — no
# window, no second scan shape at 100 TB.  Magnitude audit as at module
# head: n*s2 <= 1e10 * 1e5 rows-per-type ~ 1e15 < 2^53 at sf0.1; the
# z-score itself is ordinary double arithmetic on bit-identical inputs.
# --------------------------------------------------------------------------

def _value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _series(spark, sf_dir).withColumn(
        "v_c", F.round(F.col("value") * 100.0)
    )
    n = F.count(F.lit(1))
    s1 = F.sum("v_c")
    s2 = F.sum(F.col("v_c") * F.col("v_c"))
    mom = df.groupBy("event_type").agg(
        n.alias("n"), s1.alias("s1"), s2.alias("s2")
    )
    mom = mom.withColumn("mean_c", F.col("s1") / F.col("n")).withColumn(
        "sd_c",
        F.when(
            F.col("n") >= 2,
            F.sqrt(
                (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                / (F.col("n") * (F.col("n") - 1))
            ),
        ),
    )
    z = (F.col("v_c") - F.col("mean_c")) / F.col("sd_c")
    return (
        df.join(F.broadcast(mom.select("event_type", "mean_c", "sd_c")),
                "event_type")
        .filter(
            F.col("sd_c").isNotNull()
            & (F.abs(F.col("v_c") - F.col("mean_c")) > 3.0 * F.col("sd_c"))
        )
        .select(
            "event_type",
            "event_id",
            "ts",
            "value",
            z.alias("zscore"),
        )
    )


_register(
    QuerySpec(
        name="value_outliers_3sigma",
        survey_ids=("A2", "F1"),
        description="3-sigma tick outliers: per-type exact integer "
        "moments broadcast onto the stream, |x - mean| > 3 sd flag with "
        "the z-score (anomaly surfacing for the DQ pipeline)",
        spark=_value_outliers,
        oracle="""
WITH c AS (
  SELECT event_id, event_type, ts, value, round(value * 100.0) AS v_c
  FROM events
),
m AS (
  SELECT event_type,
         count(*) AS n, sum(v_c) AS s1, sum(v_c * v_c) AS s2
  FROM c GROUP BY event_type
),
mm AS (
  SELECT event_type, s1 / n AS mean_c,
         CASE WHEN n >= 2
              THEN sqrt((n * s2 - s1 * s1) / (n * (n - 1))) END AS sd_c
  FROM m
)
SELECT c.event_type, c.event_id, c.ts, c.value,
       (c.v_c - mm.mean_c) / mm.sd_c AS zscore
FROM c JOIN mm USING (event_type)
WHERE mm.sd_c IS NOT NULL
  AND abs(c.v_c - mm.mean_c) > 3.0 * mm.sd_c
""",
    )
)


# --------------------------------------------------------------------------
# Co-occurrence lift over user baskets: which event types a user tends to
# trigger TOGETHER.  lift(a,b) = P(a,b) / (P(a) P(b)) over per-user type
# sets — all counts are exact integers, the lift is ONE double division
# of two exact integer products (correctly rounded in both engines; the
# products stay < 2^53 by orders of magnitude).  Plan: distinct
# (user, type) grain once, per-type counts, a type<type self-join at the
# USER grain (bounded: <= |types|^2 output groups), broadcast totals.
# --------------------------------------------------------------------------

def _type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ut = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    totals = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_type"))
    n_users = ut.select("user_id").distinct().count()
    a = ut.alias("a")
    b = ut.alias("b")
    both = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_type").alias("n_a")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_type").alias("n_b")
    )
    return (
        both.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both") * F.lit(int(n_users))).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


_register(
    QuerySpec(
        name="type_cooccurrence_lift",
        survey_ids=("A2", "D5"),
        description="market-basket lift over per-user event-type sets: "
        "P(a,b)/(P(a)P(b)) as one exact-integer-ratio double division",
        spark=_type_cooccurrence,
        oracle="""
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_type
        FROM ut GROUP BY event_type),
nu AS (SELECT count(DISTINCT user_id) AS n FROM ut),
pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b USING (user_id)
  WHERE a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_both,
       ta.n_type AS n_a, tb.n_type AS n_b,
       CAST(n_both * nu.n AS DOUBLE)
         / CAST(ta.n_type * tb.n_type AS DOUBLE) AS lift
FROM pr
JOIN tot ta ON pr.type_a = ta.event_type
JOIN tot tb ON pr.type_b = tb.event_type
CROSS JOIN nu
""",
    )
)
