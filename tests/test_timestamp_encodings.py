"""Parquet timestamp-encoding drift guard.

Round 2 regression: the driver's testdata moved from pyarrow
``timestamp[ns]`` to ``timestamp[us]`` parquet encoding; Spark 4 reads the
former as long (under nanosAsLong) and the latter as TIMESTAMP_NTZ, and
``load_table`` only normalized the nanos case — every ``unix_millis(ts)``
consumer died.  This test writes the SAME logical table in every encoding
pyarrow can emit (ns, us, ms, and tz-aware us) and asserts that every
expression family ``load_table`` consumers use works identically on all of
them, so any future encoding drift fails HERE before the round driver sees
it.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.session import load_table, scan_time_range

ROWS = [
    (1, dt.datetime(2024, 1, 5, 12, 0, 0), "a", 1.5),
    (2, dt.datetime(2024, 1, 5, 12, 30, 0), "a", 2.5),
    (3, dt.datetime(2024, 1, 6, 0, 0, 0), "b", 3.5),
]

ENCODINGS = {
    "ns": pa.timestamp("ns"),
    "us": pa.timestamp("us"),
    "ms": pa.timestamp("ms"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}


def _write(tmpdir: str, enc_name: str) -> str:
    sf_dir = os.path.join(tmpdir, enc_name)
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], ENCODINGS[enc_name]),
            "event_type": pa.array([r[2] for r in ROWS], pa.string()),
            "value": pa.array([r[3] for r in ROWS], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_load_table_consumer_exprs_every_encoding(spark, tmp_path, enc):
    sf_dir = _write(str(tmp_path), enc)
    df = load_table(spark, sf_dir, "events")
    # the exact expression families the registry uses on ts
    out = (
        df.select(
            "event_id",
            F.unix_millis("ts").alias("epoch_ms"),
            F.date_format("ts", "yyyyMMdd").alias("date"),
            F.timestamp_millis(
                (F.floor(F.unix_millis("ts") / 3_600_000) * 3_600_000).cast("long")
            ).alias("bucket_1h"),
        )
        .orderBy("event_id")
        .collect()
    )
    assert [r.epoch_ms for r in out] == [
        int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1000) for r in ROWS
    ]
    assert [r.date for r in out] == ["20240105", "20240105", "20240106"]
    assert out[0].bucket_1h == dt.datetime(2024, 1, 5, 12, 0, 0)
    # dtype must be plain TIMESTAMP (not NTZ, not long) in every encoding
    assert dict(df.dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_scan_time_range_every_encoding(spark, tmp_path, enc):
    sf_dir = _write(str(tmp_path), enc)
    lo = int(dt.datetime(2024, 1, 5, tzinfo=dt.timezone.utc).timestamp() * 1000)
    hi = int(dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc).timestamp() * 1000)
    df = scan_time_range(spark, sf_dir, "events", "ts", lo, hi)
    got = sorted(r.event_id for r in df.collect())
    assert got == [1, 2]
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_scan_time_range_pushdown_raw_domain(spark, tmp_path):
    """ns and us(-NTZ) scans must both push the range predicate to parquet."""
    for enc in ("ns", "us"):
        sf_dir = _write(str(tmp_path), enc)
        lo = int(dt.datetime(2024, 1, 5, tzinfo=dt.timezone.utc).timestamp() * 1000)
        hi = int(dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc).timestamp() * 1000)
        df = scan_time_range(spark, sf_dir, "events", "ts", lo, hi)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert pushed and "ts" in pushed[0], (enc, plan)
