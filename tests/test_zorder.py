"""Z-order layout + multi-column data skipping (sinks/zorder.py).

The claims under test:
1. correctness — a stats-pruned read returns EXACTLY full-scan + filter;
2. skipping — a 2-D box predicate over a z-ordered layout prunes most
   files, while the same predicate's off-axis half prunes (almost)
   nothing on a linearly sorted layout — the reason z-order exists;
3. determinism — the z-key is a pure expression of the row.
"""

import pytest
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.sinks.zorder import (
    column_bounds,
    compute_file_stats,
    files_matching,
    read_pruned,
    read_sidecar,
    write_zordered,
    zorder_key,
)

N = 20_000
N_FILES = 32


@pytest.fixture(scope="module")
def grid(spark):
    # two independent uniform axes — the adversarial case for any single
    # linear sort (sorting by x randomizes y within a file and vice versa)
    return (
        spark.range(N)
        .select(
            F.col("id").alias("row_id"),
            (F.pmod(F.col("id") * 40503 + 17, F.lit(65536)))
            .cast("double")
            .alias("x"),
            (F.pmod(F.col("id") * 69069 + 5, F.lit(65536)))
            .cast("double")
            .alias("y"),
        )
    )


def _rows(df):
    return sorted(r.row_id for r in df.select("row_id").collect())


def test_zorder_key_deterministic(spark, grid):
    bounds = column_bounds(grid, ["x", "y"])
    a = grid.select(zorder_key(grid, ["x", "y"], bounds).alias("z"))
    b = grid.select(zorder_key(grid, ["x", "y"], bounds).alias("z"))
    assert a.collect() == b.collect()


def test_pruned_read_equals_full_filter(spark, grid, tmp_path):
    path = str(tmp_path / "zlake")
    write_zordered(spark, grid, path, ["x", "y"], N_FILES)
    pred = {"x": (10_000.0, 20_000.0), "y": (30_000.0, 40_000.0)}
    df, kept, total = read_pruned(spark, path, pred)
    expected = grid.filter(
        F.col("x").between(10_000.0, 20_000.0)
        & F.col("y").between(30_000.0, 40_000.0)
    )
    assert _rows(df) == _rows(expected)
    assert total == N_FILES


def test_zorder_skips_on_both_axes(spark, grid, tmp_path):
    zpath = str(tmp_path / "zlake")
    write_zordered(spark, grid, zpath, ["x", "y"], N_FILES)
    # ~2.4% of the key space on each axis -> a z-layout keeps only the
    # files whose hyper-rectangle touches the box
    box = {"x": (0.0, 1600.0), "y": (0.0, 1600.0)}
    _, kept_z, total_z = read_pruned(spark, zpath, box)
    assert total_z == N_FILES
    assert kept_z <= total_z // 4, (kept_z, total_z)

    # single-axis predicates must ALSO prune on a z-layout (each file
    # spans a bounded x-range and a bounded y-range)
    for axis in ("x", "y"):
        _, kept_one, _ = read_pruned(spark, zpath, {axis: (0.0, 1600.0)})
        assert kept_one < total_z, axis


def test_linear_sort_cannot_skip_off_axis(spark, grid, tmp_path):
    """The negative control: sort by x only, then predicate on y."""
    path = str(tmp_path / "xsorted")
    (
        grid.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(path)
    )
    stats = compute_file_stats(spark, path, ["x", "y"])
    on_axis = files_matching(stats, {"x": (0.0, 1600.0)})
    off_axis = files_matching(stats, {"y": (0.0, 1600.0)})
    assert len(on_axis) <= len(stats) // 4  # the sorted axis prunes hard
    # y is uniform within every x-file: essentially nothing prunes
    assert len(off_axis) >= len(stats) - 1


def test_file_count_and_sidecar(spark, grid, tmp_path):
    path = str(tmp_path / "zlake")
    stats = write_zordered(spark, grid, path, ["x", "y"], N_FILES)
    side = read_sidecar(spark, path)
    assert side["zcols"] == ["x", "y"]
    assert set(side["files"]) == set(stats)
    assert len(stats) == N_FILES
    for st in stats.values():
        assert set(st) == {"x", "y"}
        assert st["x"][0] <= st["x"][1]


def test_empty_result_box(spark, grid, tmp_path):
    path = str(tmp_path / "zlake")
    write_zordered(spark, grid, path, ["x", "y"], N_FILES)
    df, kept, _ = read_pruned(spark, path, {"x": (1e9, 2e9)})
    assert kept == 0
    assert df.count() == 0


def test_timestamp_axis(spark, tmp_path):
    """Temporal z-columns bucketize on epoch micros; predicates are given
    in micros (the sidecar's axis)."""
    df = spark.range(5_000).select(
        F.col("id").alias("row_id"),
        F.timestamp_micros(
            (F.col("id") % 1000) * 86_400_000_000 + F.lit(1_700_000_000_000_000)
        ).alias("ts"),
        F.pmod(F.col("id") * 40503, F.lit(1000)).cast("double").alias("v"),
    )
    path = str(tmp_path / "tlake")
    write_zordered(spark, df, path, ["ts", "v"], 16)
    lo = 1_700_000_000_000_000
    hi = lo + 50 * 86_400_000_000
    out, kept, total = read_pruned(spark, path, {"ts": (lo, hi)})
    expected = df.filter(
        (F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi)
    )
    assert _rows(out) == _rows(expected)
    assert kept < total


def test_read_pruned_without_sidecar_falls_back(spark, grid, tmp_path):
    """Pruning is an optimization: a layout with no stats sidecar reads
    fully (kept == total) with the exact predicate still applied."""
    path = str(tmp_path / "plain")
    grid.write.mode("overwrite").parquet(path)
    pred = {"x": (10_000.0, 20_000.0)}
    df, kept, total = read_pruned(spark, path, pred)
    assert kept == total
    expected = grid.filter(F.col("x").between(10_000.0, 20_000.0))
    assert _rows(df) == _rows(expected)
