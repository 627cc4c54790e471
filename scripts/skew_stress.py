#!/usr/bin/env python3
"""Skewed-key join stress receipt (VERDICT r10 item 6): manufacture a
hot key at ~sf1 in the session-attribution join shape and measure the
salted / AQE-split mitigations against the plain co-located shuffle
join.

Setup: events at ~sf1 (10x rows, scripts/gen_scale_data.py output) with
30% of all rows remapped to ONE user — the "viral key" every real
attribution workload eventually grows — then replicated REP x so the
straggler is attributable work, not noise (8M fact rows).  Each user
carries a BOUNDED span table (N_SLICES time slices); facts join spans
on user_id, so in the plain plan the hot user's 2.4M fact rows meet
its spans on a single reducer while the median reducer sees ~2% of
that.

Arms (broadcast disabled on all — the regime where join skew exists at
all is the non-broadcastable build side; with a broadcastable dim
Spark never shuffles the fact):

  plain       co-located shuffle join, AQE skew split OFF
  aqe         AQE skew-join ON with demo-scaled thresholds (defaults
              trigger at 256 MB partitions) — on THIS workload the
              rule DECLINES: the downstream per-user aggregate reuses
              the join's hash partitioning, and splitting would insert
              an extra shuffle (forceOptimizeSkewedJoin=false default)
  aqe_forced  same + forceOptimizeSkewedJoin=true — the split fires
  salted      operators.skew.salted_join (replicated-dim lanes,
              N_SALTS) — the explicit mitigation; needs no AQE forcing
              because the salt is part of the logical plan
  agg_plain   hot-key GROUP-BY (no join): plain hash aggregate over the
              same 8M skewed facts — Spark partial-aggregates map-side,
              so the hot key collapses to one row per map task BEFORE
              the shuffle and the reducer never sees the skew
  agg_salted  operators.skew.salted_agg two-phase variant of the same
              aggregate — measures what the explicit salt costs in the
              regime where map-side combine already does the job

Per arm: warm-up + N measured runs (wall-clock) and the max task
executorRunTime of the heaviest stage, via the UI REST taskSummary —
the straggler metric wall-clock alone can hide on a 32-thread box.
Row-count and value equality across arms is asserted (the mitigations
must not change the answer).

Usage:
    python3 scripts/skew_stress.py [SF1_DIR] [--runs N] [--out FILE]
"""

from __future__ import annotations

import calendar
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_USER = 42
N_SLICES = 4
REP = 8
N_SALTS = 16


def _max_task_ms(spark, after_epoch_ms: float) -> float:
    """Max task executorRunTime (ms) over stages submitted after the
    given wall time, via the local UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as fh:
            stages = json.load(fh)
    except Exception:
        return -1.0
    worst = -1.0
    for st in stages:
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        # ISO 'GMT' suffix: the fields are UTC, so convert with
        # calendar.timegm — time.mktime would interpret them in LOCAL
        # time and the recency filter would be off by the UTC offset
        # (silently returning -1 or counting stale stages)
        try:
            t = time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")
            sub_ms = calendar.timegm(t) * 1000.0
        except ValueError:
            continue
        if sub_ms < after_epoch_ms - 1000:
            continue
        try:
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages/"
                f"{st['stageId']}/{st['attemptId']}/taskSummary"
                "?quantiles=1.0"
            ) as fh:
                summ = json.load(fh)
            worst = max(worst, float(summ["executorRunTime"][0]))
        except Exception:
            continue
    return worst


def main() -> int:
    argv = sys.argv[1:]
    sf1 = "/tmp/spark_graft_sf1"
    runs = 3
    out = None
    i = 0
    while i < len(argv):
        if argv[i] == "--runs":
            runs = int(argv[i + 1])
            i += 2
        elif argv[i] == "--out":
            out = argv[i + 1]
            i += 2
        else:
            sf1 = argv[i]
            i += 1

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from crypto_data_ingestion_module_spark.operators.skew import salted_join
    from crypto_data_ingestion_module_spark.session import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew_stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf1, "events")  # events needs the NTZ-safe read
    # 30% of rows remapped to the viral key, deterministically; facts
    # then replicated REP x (distinct event ids) so the hot reducer's
    # work is attributable straggler time, not noise
    skewed = ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 < 3, F.lit(HOT_USER)).otherwise(
            F.col("user_id")
        ),
    )
    facts = (
        skewed.select(
            "user_id",
            "event_id",
            F.col("value").alias("p_value"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
            F.explode(F.array(*[F.lit(i) for i in range(REP)])).alias("rep"),
        )
        .withColumn(
            "event_id", F.col("event_id") * REP + F.col("rep")
        )
        .drop("rep")
    )
    # BOUNDED per-user span table: N_SLICES equal time slices between
    # the user's first and last event — the session-attribution shape
    # with a deterministic, small span count.  dims << facts is the
    # regime where dim replication (salting) is affordable at all; a
    # dim side comparable to the fact belongs to the sort-merge world.
    bounds = skewed.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("lo"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("hi"),
    )
    spans = bounds.select(
        "user_id",
        "lo",
        ((F.col("hi") - F.col("lo")) / N_SLICES + 1).cast("long").alias("w"),
        F.explode(F.array(*[F.lit(i) for i in range(N_SLICES)])).alias("sl"),
    ).select(
        "user_id",
        (F.col("lo") + F.col("sl") * F.col("w")).alias("s_lo"),
        (F.col("lo") + (F.col("sl") + 1) * F.col("w")).alias("s_hi"),
        F.col("sl"),
    )
    # 32-way ROUND-ROBIN checkpoint: the parquet read gives ~3 input
    # splits, and without this the map-side exchange write (3 tasks x
    # 2.7M rows) dominates every arm identically, hiding the reduce-side
    # skew this receipt exists to measure
    facts = facts.repartition(32).localCheckpoint(eager=True)
    spans = spans.localCheckpoint(eager=True)
    n_facts, n_spans = facts.count(), spans.count()

    def workload(mode: str):
        if mode == "salted":
            j = salted_join(facts, spans, ["user_id"], n_salts=N_SALTS)
        else:
            j = facts.join(spans, "user_id")
        return (
            j.filter(
                (F.col("p_us") >= F.col("s_lo")) & (F.col("p_us") < F.col("s_hi"))
            )
            .groupBy("user_id", "sl")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("p_value") * 1_000_000).cast("long")).alias(
                    "v_micro"
                ),
            )
        )

    def configure(mode: str):
        c = spark.conf
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c.set("spark.sql.adaptive.enabled", "true")
        c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        if mode.startswith("aqe"):
            c.set("spark.sql.adaptive.skewJoin.enabled", "true")
            # the workload's per-user agg reuses the join's
            # partitioning, so the split would add a shuffle and the
            # rule declines by default; the forced arm proves that
            c.set(
                "spark.sql.adaptive.forceOptimizeSkewedJoin",
                "true" if mode == "aqe_forced" else "false",
            )
            # defaults detect skew only past 256 MB per partition; the
            # demo's hot partition is tens of MB, so scale the gates
            # down (factor 2x median, floor 4 MB) — at 100 TB the
            # DEFAULTS fire on the same shape
            c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
            c.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "4m",
            )
            c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        else:
            c.set("spark.sql.adaptive.skewJoin.enabled", "false")
            c.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"
            )

    # answer equality across ALL FOUR arms first (cheap, sf-independent)
    configure("plain")
    want = sorted(map(tuple, workload("plain").collect()))
    configure("aqe")
    assert sorted(map(tuple, workload("aqe").collect())) == want
    configure("aqe_forced")
    assert sorted(map(tuple, workload("aqe_forced").collect())) == want
    configure("salted")
    assert sorted(map(tuple, workload("salted").collect())) == want
    n_rows = len(want)

    # --- aggregation arms (VERDICT r11 item 2): the OTHER half of the
    # hot-key story.  Same viral key, plain hash-agg vs salted_agg.
    # Expectation worth measuring rather than asserting: Spark's hash
    # aggregate ALREADY partial-aggregates map-side, so a pure algebraic
    # aggregate (sum/count) collapses the hot key to one row per map
    # task before the shuffle — the reducer never sees the skew, and
    # salting pays an extra shuffle for nothing.  salted_agg's real
    # regime is state that does NOT collapse map-side (large collect/
    # exact-median style state) or aggregation fed by a join (covered by
    # the join arms above, where AQE declines).
    from crypto_data_ingestion_module_spark.operators.skew import salted_agg

    def agg_workload(mode: str):
        if mode == "agg_salted":
            return salted_agg(
                facts,
                ["user_id"],
                {
                    "s": F.sum(
                        F.round(F.col("p_value") * 1_000_000).cast("long")
                    ),
                    "n": F.count(F.lit(1)),
                },
                {"v_micro": F.sum("s"), "n": F.sum("n")},
            ).select("user_id", "n", "v_micro")
        return facts.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("p_value") * 1_000_000).cast("long")
            ).alias("v_micro"),
        )

    configure("plain")
    agg_want = sorted(map(tuple, agg_workload("agg_plain").collect()))
    assert sorted(map(tuple, agg_workload("agg_salted").collect())) == agg_want

    results: dict[str, dict] = {}
    arms = ("plain", "aqe", "aqe_forced", "salted", "agg_plain", "agg_salted")
    for mode in arms:
        configure("plain" if mode.startswith("agg") else mode)
        load = agg_workload if mode.startswith("agg") else workload
        load(mode).write.mode("overwrite").format("noop").save()  # warm
        spark._jvm.System.gc()
        time.sleep(1.0)
        walls, worsts = [], []
        for _ in range(runs):
            t0 = time.time()
            load(mode).write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
            worsts.append(_max_task_ms(spark, t0 * 1000.0))
        walls_s = sorted(walls)
        results[mode] = {
            "wall_runs": walls,
            "wall_median": walls_s[len(walls_s) // 2],
            "max_task_ms_runs": worsts,
            "max_task_ms_median": sorted(worsts)[len(worsts) // 2],
        }
        print(mode, results[mode])

    receipt = {
        "sf1_dir": sf1,
        "cpus": cpus,
        "hot_user_share": 0.3,
        "n_slices": N_SLICES,
        "rep": REP,
        "n_salts": N_SALTS,
        "n_facts": n_facts,
        "n_spans": n_spans,
        "result_rows": n_rows,
        "agg_result_rows": len(agg_want),
        "answers_identical_across_arms": True,
        "arms": results,
    }
    line = json.dumps(receipt)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
