"""Misra-Gries frequent-items sketch: the classic guarantees, pinned
against exact counts on an adversarially skewed frame."""

from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.sketch import (
    frequent_items,
    frequent_items_exact,
)
from crypto_data_ingestion_module_spark.session import load_table
from tests.conftest import SF_SMALL


def test_mg_bounds_on_skewed_data(spark):
    # power-law-ish: item i gets ~ N/(i+1) rows, plus a long uniform tail
    rows = []
    for i in range(8):
        rows += [(f"hot{i}",)] * (2000 // (i + 1))
    rows += [(f"cold{j}",) for j in range(3000)]
    df = spark.createDataFrame(rows, "v string").repartition(16)
    n = len(rows)
    k = 64

    got = {r.item: r.count_lower for r in frequent_items(df, "v", k=k, top=50).collect()}
    exact = {
        r.v: r.c
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    thresh = n / (k + 1)
    # completeness: every true heavy hitter above n/(k+1) survives
    for item, c in exact.items():
        if c > thresh:
            assert item in got, (item, c, thresh)
    # soundness: the reported count is a LOWER bound within n/(k+1)
    for item, lo in got.items():
        assert lo <= exact[item], (item, lo, exact[item])
        assert exact[item] - lo <= thresh + 1e-9, (item, lo, exact[item])


def test_mg_over_testdata_runs_bounded(spark):
    out = frequent_items(
        load_table(spark, SF_SMALL, "events"), "user_id", k=64, top=20
    ).collect()
    assert 0 < len(out) <= 20
    assert all(r.count_lower >= 1 for r in out)


def test_exact_two_pass_equals_group_by_having(spark):
    # the two-pass recipe must be partitioning-independent: its output
    # equals the plain GROUP BY ... HAVING cnt*(k+1) > n on the same
    # frame, including items that straddle the sketch's survivor set
    rows = []
    for i in range(8):
        rows += [(f"hot{i}",)] * (2000 // (i + 1))
    rows += [(f"cold{j}",) for j in range(3000)]
    df = spark.createDataFrame(rows, "v string").repartition(16)
    k = 9
    n = len(rows)
    got = [
        (r.item, r.cnt) for r in frequent_items_exact(df, "v", k=k).collect()
    ]
    exact = {
        r.v: r.c
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    want = sorted(
        ((v, c) for v, c in exact.items() if c * (k + 1) > n),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want
    assert 0 < len(want) < len(exact)  # the threshold genuinely filters


def test_hll_distinct_bound_vs_exact(spark):
    # approx_count_distinct(rsd=0.02): pin relative error per group well
    # inside the advertised bound's tail (3x rsd covers >99.7%)
    ev = load_table(spark, SF_SMALL, "events")
    approx = {
        (r.event_type,): r.a
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
        .collect()
    }
    exact = {
        (r.event_type,): r.e
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("e"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for key, e in exact.items():
        assert abs(approx[key] - e) <= max(1, 0.06 * e), (key, approx[key], e)


# ---------------------------------------------------------------------------
# KMV (bottom-k theta-sketch)
# ---------------------------------------------------------------------------


def test_kmv_bottom_k_is_mergeable(spark):
    # bottom-k of a union == bottom-k of concatenated per-split
    # bottom-k partials: the law that makes KMV a sketch.
    from crypto_data_ingestion_module_spark.operators.sketch import (
        kmv_bottom_k,
    )

    df = spark.range(1000).select(F.col("id").alias("v"))
    whole = kmv_bottom_k(df, "v", 32).select("h", "item")
    parts = [
        kmv_bottom_k(df.filter(F.col("v") % 3 == i), "v", 32).select(
            "h", "item"
        )
        for i in range(3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2]).distinct()
    from crypto_data_ingestion_module_spark.operators.sketch import kmv_hash

    merged = (
        u.orderBy("h", "item").limit(32).select("h", "item")
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_kmv_exact_below_k(spark):
    from crypto_data_ingestion_module_spark.operators.sketch import (
        kmv_distinct_estimate,
    )

    df = spark.range(40).select(F.col("id").alias("v"))
    row = kmv_distinct_estimate(df, "v", 64).collect()[0]
    assert row["n_kept"] == 40
    assert row["distinct_est"] == 40  # sketch holds everything: exact


def test_kmv_estimate_within_theoretical_error(spark):
    # SE ~ 1/sqrt(k-2); allow 3 sigma.  10_000 true distinct, k=256.
    from crypto_data_ingestion_module_spark.operators.sketch import (
        kmv_distinct_estimate,
    )

    k = 256
    df = spark.range(10_000).select(F.col("id").alias("v"))
    est = kmv_distinct_estimate(df, "v", k).collect()[0]["distinct_est"]
    assert abs(est - 10_000) / 10_000 < 3.0 / (k - 2) ** 0.5


def test_kmv_sample_is_frequency_blind(spark):
    # The kept ITEMS form a uniform sample of the DISTINCT values: an
    # item appearing 1000x must have the same md5 rank as one appearing
    # once — feeding duplicates must not change the sketch at all.
    from crypto_data_ingestion_module_spark.operators.sketch import (
        kmv_bottom_k,
    )

    base = spark.range(500).select(F.col("id").alias("v"))
    skewed = base.unionByName(
        spark.range(10).select(F.lit(7).alias("v"))
    )  # value 7 now appears 11x
    a = sorted(map(tuple, kmv_bottom_k(base, "v", 50).collect()))
    b = sorted(map(tuple, kmv_bottom_k(skewed, "v", 50).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _cm_tokens(spark):
    from crypto_data_ingestion_module_spark.session import load_table
    from tests.conftest import SF_SMALL

    return (
        load_table(spark, SF_SMALL, "documents")
        .where(F.col("text").isNotNull())
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )


def test_cm_never_underestimates_and_respects_error_bound(spark):
    from crypto_data_ingestion_module_spark.operators.sketch import (
        cm_counters,
        cm_point_estimates,
    )

    toks = _cm_tokens(spark)
    n = toks.count()
    counters = cm_counters(toks, "tok", depth=4, width=512)
    items = toks.select("tok").distinct()
    est = {
        r["item"]: r["cm_est"]
        for r in cm_point_estimates(counters, items, "tok", 4, 512).collect()
    }
    exact = {
        r["tok"]: r["cnt"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    overs = []
    for it, ex in exact.items():
        assert est[it] >= ex, it  # overestimate-only, no exceptions
        overs.append(est[it] - ex)
    # E[over] <= n/width; allow 3x slack on the mean
    assert sum(overs) / len(overs) <= 3 * n / 512


def test_cm_counters_are_bounded_and_mergeable(spark):
    from crypto_data_ingestion_module_spark.operators.sketch import (
        cm_counters,
    )

    toks = _cm_tokens(spark)
    whole = cm_counters(toks, "tok", depth=4, width=128)
    assert whole.count() <= 4 * 128
    # merge law: counters of a union = summed per-(s,b) counters
    parts = [
        cm_counters(
            toks.where(F.crc32(F.col("tok")) % 2 == i), "tok", 4, 128
        )
        for i in range(2)
    ]
    merged = (
        parts[0].unionByName(parts[1]).groupBy("s", "b").agg(
            F.sum("c").alias("c")
        )
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_cm_absent_item_estimates_zero(spark):
    # The counter table is sparse (only non-zero buckets stored), so an
    # item absent from the sketched data must coalesce empty buckets to
    # 0 and estimate 0 — an inner join would drop it from the output or
    # min over only its non-empty buckets (ADVICE r9).
    from crypto_data_ingestion_module_spark.operators.sketch import (
        cm_counters,
        cm_point_estimates,
    )

    data = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3, ["tok"]
    )
    counters = cm_counters(data, "tok", depth=4, width=512)
    probes = spark.createDataFrame(
        [("a",), ("never-seen-item",)], ["tok"]
    )
    got = {
        r["item"]: r["cm_est"]
        for r in cm_point_estimates(
            counters, probes, "tok", depth=4, width=512
        ).collect()
    }
    assert got["a"] == 5  # present item unchanged by the left join
    # at width=512 with 2 distinct items, all 4 probed buckets of the
    # absent item are empty with overwhelming probability; even in a
    # collision the estimate stays an overestimate of 0's true count
    assert "never-seen-item" in got
    assert got["never-seen-item"] == 0
