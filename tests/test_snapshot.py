"""Snapshot-isolated lake (sinks/snapshot.py): readers racing a writer see
exactly the old or the new snapshot, never a mix (VERDICT r3 item 4)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.sinks.snapshot import (
    commit_version,
    current_version,
    init_snapshot_lake,
    read_manifest,
    read_snapshot,
    snapshot_files,
    snapshot_upsert,
    vacuum,
)

T0 = dt.datetime(2024, 1, 1, 0, 0)
T1 = dt.datetime(2024, 1, 1, 0, 15)
T2 = dt.datetime(2024, 1, 2, 0, 0)  # next day → different partition


def _candles(spark, rows):
    return spark.createDataFrame(
        [
            (o, o + 1, o - 1, o + 0.5, v, ts, sym, ex, ivl, "spot")
            for (o, v, ts, sym, ex, ivl) in rows
        ],
        "open double, high double, low double, close double, volume double, "
        "timestamp timestamp, symbol string, exchange string, "
        "interval string, data_type string",
    )


def _state(df):
    return sorted(
        (r.symbol, r.date, r.timestamp, r.open, r.volume)
        for r in df.select(
            "symbol", "date", "timestamp", "open", "volume"
        ).collect()
    )


def test_snapshot_upsert_keep_last(spark, tmp_path):
    root = str(tmp_path / "snap")
    v1 = snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
                (110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m"),
            ],
        ),
        root,
    )
    assert v1 == 1
    v2 = snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m"),  # correction
                (120.0, 2.0, T2, "BTC-USDT", "coinbase", "15m"),  # new day
            ],
        ),
        root,
    )
    assert v2 == 2
    got = read_snapshot(spark, root)
    assert _state(got) == _state(
        _candles(
            spark,
            [
                (999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m"),
                (110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m"),
                (120.0, 2.0, T2, "BTC-USDT", "coinbase", "15m"),
            ],
        ).withColumn("date", F.date_format("timestamp", "yyyyMMdd"))
    )
    # time travel: version 1 still reads the pre-correction state
    old = read_snapshot(spark, root, version=1)
    assert [r.open for r in old.filter(F.col("timestamp") == T0).collect()] == [
        100.0
    ]


def test_reader_sees_old_or_new_never_mixed(spark, tmp_path):
    """Simulate every intermediate writer state a racing reader could
    observe and pin that the resolved snapshot is always exactly-old or
    exactly-new — the property the directory-swap path cannot give."""
    root = str(tmp_path / "snap")
    base = _candles(
        spark,
        [
            (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
            (200.0, 2.0, T2, "BTC-USDT", "coinbase", "15m"),
        ],
    )
    snapshot_upsert(spark, base, root)
    old_state = _state(read_snapshot(spark, root))

    patch = _candles(
        spark,
        [
            (111.0, 1.1, T0, "BTC-USDT", "coinbase", "15m"),
            (222.0, 2.2, T2, "BTC-USDT", "coinbase", "15m"),
        ],
    )

    # --- mid-write: new data files exist on disk, manifest not committed.
    # A reader resolving through the pointer must still see the old state.
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        _write_data_files,
    )

    staged = _write_data_files(
        spark,
        patch.withColumn("date", F.date_format("timestamp", "yyyyMMdd"))
        .withColumn("_ingest_seq", F.lit(5).cast("long")),
        root,
        (
            "symbol",
            "interval",
            "data_type",
            "exchange",
            "date",
        ),
    )
    assert staged, "staged files should exist"
    assert _state(read_snapshot(spark, root)) == old_state
    assert current_version(spark, root) == 1

    # --- the real commit path (re-merges; the orphaned staged files above
    # stay invisible garbage until vacuum)
    v = snapshot_upsert(spark, patch, root, batch_seq=6)
    new_state = _state(read_snapshot(spark, root))
    assert v == 2
    assert new_state != old_state
    assert [s[3] for s in new_state] == [111.0, 222.0]
    # old version remains fully intact — no partial overwrite of its files
    assert _state(read_snapshot(spark, root, version=1)) == old_state


def test_concurrent_commit_detected(spark, tmp_path):
    root = str(tmp_path / "snap")
    init_snapshot_lake(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    man = read_manifest(spark, root, 1)
    # a second writer committing the same next-version must fail loudly
    commit_version(spark, root, dict(man, version=2), 2)
    with pytest.raises(RuntimeError, match="already committed"):
        commit_version(spark, root, dict(man, version=2), 2)


def test_vacuum_drops_only_unreferenced(spark, tmp_path):
    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    snapshot_upsert(
        spark,
        _candles(spark, [(111.0, 1.1, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        batch_seq=2,
    )
    before = _state(read_snapshot(spark, root))
    v1_files = set(snapshot_files(spark, root, 1))
    v2_files = set(snapshot_files(spark, root, 2))
    deleted = vacuum(spark, root, keep=1)
    # everything v1-only is gone, everything the live snapshot needs stays
    assert set(deleted) == v1_files - v2_files
    assert _state(read_snapshot(spark, root)) == before
    assert current_version(spark, root) == 2
    with pytest.raises(Exception):
        read_manifest(spark, root, 1)


def test_compact_snapshot_preserves_content_and_isolation(spark, tmp_path):
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        compact_snapshot,
    )

    root = str(tmp_path / "snap")
    # Build a version whose 20240101 partition holds files from two
    # separate write batches (the many-tasks-per-partition layout a
    # large write produces): two data batches, one stitched manifest.
    from crypto_data_ingestion_module_spark.sinks.parquet_lake import (
        PARTITION_COLS,
    )
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        _partition_of,
        _write_data_files,
    )

    def _prep(df, seq):
        return df.withColumn(
            "date", F.date_format("timestamp", "yyyyMMdd")
        ).withColumn("_ingest_seq", F.lit(seq).cast("long"))

    f1 = _write_data_files(
        spark,
        _prep(
            _candles(
                spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]
            ),
            0,
        ),
        root,
        PARTITION_COLS,
    )
    f2 = _write_data_files(
        spark,
        _prep(
            _candles(
                spark, [(110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m")]
            ),
            0,
        ),
        root,
        PARTITION_COLS,
    )
    parts = {}
    for f in f1 + f2:
        parts.setdefault(_partition_of(f, PARTITION_COLS), []).append(f)
    commit_version(spark, root, {"version": 1, "partitions": parts}, 1)
    before = _state(read_snapshot(spark, root))
    man1 = read_manifest(spark, root, 1)
    assert any(len(fl) > 1 for fl in man1["partitions"].values())

    v = compact_snapshot(spark, root, max_files_per_partition=1)
    assert v == 2
    # content byte-identical, layout compacted to one file per partition
    assert _state(read_snapshot(spark, root)) == before
    man = read_manifest(spark, root, 2)
    assert all(len(fl) == 1 for fl in man["partitions"].values())
    # the pre-compaction snapshot still reads intact (isolation)
    assert _state(read_snapshot(spark, root, version=1)) == before
    # idempotent: nothing left to compact
    assert compact_snapshot(spark, root, max_files_per_partition=1) is None


def test_snapshot_upsert_retries_on_lost_commit_race(spark, tmp_path, monkeypatch):
    """Optimistic concurrency: if another writer claims the next version
    between merge and commit, the upsert recomputes against the NEW
    current snapshot and lands on a later version with both writers'
    rows intact."""
    import crypto_data_ingestion_module_spark.sinks.snapshot as snap

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )

    competitor = _candles(
        spark, [(500.0, 5.0, T2, "BTC-USDT", "coinbase", "15m")]
    )
    real_commit = snap.commit_version
    fired = {"n": 0}

    def racing_commit(sp, r, manifest, version):
        if fired["n"] == 0:
            fired["n"] += 1
            # another writer wins version 2 first
            snap._snapshot_upsert_once(sp, competitor, r, batch_seq=7)
        return real_commit(sp, r, manifest, version)

    monkeypatch.setattr(snap, "commit_version", racing_commit)
    v = snapshot_upsert(
        spark,
        _candles(spark, [(111.0, 1.1, T1, "BTC-USDT", "coinbase", "15m")]),
        root,
        batch_seq=9,
    )
    # competitor took v2; our retry landed v3 with everyone's rows
    assert v == 3
    state = _state(read_snapshot(spark, root))
    assert [s[3] for s in state] == [100.0, 111.0, 500.0]


def test_time_range_read_prunes_files_via_manifest_stats(spark, tmp_path):
    """Data skipping: the manifest's per-file ts min/max prunes the file
    list driver-side; the pruned read equals full-read + filter."""
    import datetime as dt

    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_files_in_range,
    )

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
                (110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m"),
                (200.0, 2.0, T2, "BTC-USDT", "coinbase", "15m"),
            ],
        ),
        root,
    )
    man = read_manifest(spark, root, 1)
    assert man["file_stats"] and all(
        st["ts_min_us"] <= st["ts_max_us"] for st in man["file_stats"].values()
    )

    day1 = (
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
        dt.datetime(2024, 1, 1, 23, 59, tzinfo=dt.timezone.utc),
    )
    pruned = snapshot_files_in_range(spark, root, day1)
    assert 0 < len(pruned) < len(snapshot_files(spark, root, 1))

    got = _state(read_snapshot(spark, root, time_range=day1))
    want = _state(
        read_snapshot(spark, root).filter(
            F.col("timestamp") < dt.datetime(2024, 1, 2)
        )
    )
    assert got == want and len(got) == 2

    # an empty window reads nothing but keeps the schema
    empty = read_snapshot(
        spark,
        root,
        time_range=(
            dt.datetime(2030, 1, 1, tzinfo=dt.timezone.utc),
            dt.datetime(2030, 1, 2, tzinfo=dt.timezone.utc),
        ),
    )
    assert empty.count() == 0
    assert set(empty.columns) == set(read_snapshot(spark, root).columns)


def test_optimize_zorder_prunes_off_axis(spark, tmp_path):
    """OPTIMIZE ZORDER: row-identical content, a new stat-covered
    version, and file skipping on a non-time dimension (close price) —
    the off-axis pruning the time-only stats cannot give."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        optimize_snapshot_zorder,
        snapshot_files_matching,
    )

    rows = []
    for sym in ("BTC-USDT", "ETH-USDT"):
        for i in range(400):
            # price decorrelated from time: a time-sorted layout leaves
            # every file spanning nearly the full price range
            price = float((i * 7919) % 1000)
            ts = T0 + dt.timedelta(minutes=3 * i)
            rows.append((price, 1.0, ts, sym, "coinbase", "15m"))
    df = _candles(spark, rows)
    root = str(tmp_path / "snap")
    v1 = snapshot_upsert(spark, df, root)
    before = _state(read_snapshot(spark, root))

    v2 = optimize_snapshot_zorder(
        spark, root, zcols=["timestamp", "close"], files_per_partition=8
    )
    assert v2 == v1 + 1

    # layout-only change: content identical, old version still readable
    assert _state(read_snapshot(spark, root)) == before
    assert _state(read_snapshot(spark, root, version=v1)) == before

    # off-axis skipping: close in [100.5, 200.5] (close = open + 0.5)
    kept, total = snapshot_files_matching(
        spark, root, {"close": (100.5, 200.5)}
    )
    assert total > 8
    assert len(kept) < total, (len(kept), total)

    got = read_snapshot(spark, root, predicates={"close": (100.5, 200.5)})
    want = read_snapshot(spark, root).filter(
        F.col("close").between(100.5, 200.5)
    )
    assert _state(got) == _state(want)
    assert got.count() > 0

    # combined time + column pruning stays exact
    got2 = read_snapshot(
        spark,
        root,
        time_range=(T0, T0 + dt.timedelta(hours=6)),
        predicates={"close": (100.5, 200.5)},
    )
    want2 = want.filter(
        (F.col("timestamp") >= T0)
        & (F.col("timestamp") <= T0 + dt.timedelta(hours=6))
    )
    assert _state(got2) == _state(want2)


def test_schema_evolution_additive(spark, tmp_path):
    """A batch carrying a new column widens the lake: old rows read NULL,
    new data is kept (the old code silently DROPPED unknown columns),
    old versions time-travel with the old schema, and type changes are
    refused."""
    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    evolved = _candles(
        spark, [(110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m")]
    ).withColumn("trade_count", F.lit(42).cast("long"))
    v2 = snapshot_upsert(spark, evolved, root)

    cur = read_snapshot(spark, root)
    assert "trade_count" in cur.columns
    got = {
        r.timestamp: r.trade_count
        for r in cur.select("timestamp", "trade_count").collect()
    }
    assert got[T1] == 42
    assert got[T0] is None

    # merge semantics survive evolution: correcting the old row keeps the
    # widened schema and the correction wins
    snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    cur = read_snapshot(spark, root)
    row = {r.timestamp: (r.open, r.trade_count) for r in cur.collect()}
    assert row[T0] == (999.0, None)
    assert row[T1] == (110.0, 42)

    # time travel: the pre-evolution version has the old schema
    old = read_snapshot(spark, root, version=v2 - 1)
    assert "trade_count" not in old.columns

    # retyping is refused
    bad = _candles(
        spark, [(1.0, 1.0, T2, "BTC-USDT", "coinbase", "15m")]
    ).withColumn("trade_count", F.lit("oops"))
    with pytest.raises(TypeError, match="type changes"):
        snapshot_upsert(spark, bad, root)


def test_optimize_zorder_retries_lost_race(spark, tmp_path, monkeypatch):
    """An optimize losing the version race to a concurrent upsert retries
    against the new snapshot instead of failing (and the final layout
    contains the racer's rows)."""
    import crypto_data_ingestion_module_spark.sinks.snapshot as S

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )

    real_commit = S.commit_version
    fired = {"done": False}

    def racing_commit(spark_, root_, manifest, version):
        if not fired["done"]:
            fired["done"] = True
            # a concurrent upsert wins version 2 first
            snapshot_upsert(
                spark,
                _candles(
                    spark, [(555.0, 5.0, T1, "BTC-USDT", "coinbase", "15m")]
                ),
                root,
            )
        return real_commit(spark_, root_, manifest, version)

    monkeypatch.setattr(S, "commit_version", racing_commit)
    v = S.optimize_snapshot_zorder(
        spark, root, zcols=["timestamp", "close"], files_per_partition=2
    )
    assert v == 3  # upsert took 2, the optimize retried into 3
    got = _state(read_snapshot(spark, root))
    assert any(ts == T1 and o == 555.0 for (_, _, ts, o, _) in got)


def test_applied_id_ledger_skips_replay(spark, tmp_path):
    """Exactly-once from at-least-once: a re-delivered applied_id commits
    nothing — no version bump, no data change — even when the payload
    would otherwise supersede (higher batch_seq)."""
    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b0",
    )
    v = snapshot_upsert(
        spark,
        _candles(spark, [(200.0, 2.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b1",
    )
    before = _state(read_snapshot(spark, root))
    # replay of b1 with DIFFERENT payload: ledger wins, nothing changes
    out = snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b1",
    )
    assert out == v
    assert current_version(spark, root) == v
    assert _state(read_snapshot(spark, root)) == before
    man = read_manifest(spark, root, v)
    assert sorted(man["applied_ids"]) == ["b0", "b1"]


def test_upsert_merge_input_is_manifest_pruned(spark, tmp_path):
    """The keep-last merge reads ONLY the touched partitions' files: pin
    via _read_touched.inputFiles() ⊆ the touched partition's manifest
    entry, and untouched partitions keep byte-identical manifest rows."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        _manifest_schema,
        _read_touched,
    )

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
                (50.0, 1.0, T0, "ETH-USDT", "coinbase", "15m"),
                (70.0, 1.0, T2, "BTC-USDT", "coinbase", "15m"),
            ],
        ),
        root,
    )
    v1 = current_version(spark, root)
    m1 = read_manifest(spark, root, v1)
    assert len(m1["partitions"]) == 3

    touched = {
        p for p in m1["partitions"] if p.startswith("symbol=ETH-USDT")
    }
    schema = _manifest_schema(spark, root, m1, v1)
    pruned = _read_touched(spark, root, m1, touched, schema)
    got_files = {f.split(root, 1)[1].lstrip("/") for f in pruned.inputFiles()}
    want_files = {f for p in touched for f in m1["partitions"][p]}
    assert got_files == want_files  # nothing outside the touched partition

    # and after an ETH-only upsert the other partitions' entries survive
    snapshot_upsert(
        spark,
        _candles(spark, [(55.0, 2.0, T0, "ETH-USDT", "coinbase", "15m")]),
        root,
    )
    m2 = read_manifest(spark, root, current_version(spark, root))
    for p, files in m1["partitions"].items():
        if p in touched:
            assert m2["partitions"][p] != files
        else:
            assert m2["partitions"][p] == files


def test_manifest_tracks_schema_and_seq_high_water(spark, tmp_path):
    """The manifest carries the table schema and the arrival high-water
    mark, so the hot upsert path needs no footer reads and no full-lake
    max() scan; layout-only commits carry both forward."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        compact_snapshot,
    )

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="a",
    )
    snapshot_upsert(
        spark,
        _candles(spark, [(101.0, 1.0, T1, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b",
    )
    v = current_version(spark, root)
    man = read_manifest(spark, root, v)
    assert man["max_ingest_seq"] == 1  # bootstrap=0, second batch=1
    names = {f["name"] for f in man["schema"]["fields"]}
    assert {"symbol", "timestamp", "open", "_ingest_seq", "date"} <= names

    # fragment the lake so compaction has something to do, then verify
    # the layout-only commit preserved the logical manifest state
    snapshot_upsert(
        spark,
        _candles(spark, [(102.0, 1.0, T2, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="c",
    )
    compacted = compact_snapshot(spark, root, max_files_per_partition=0)
    if compacted is not None:
        man2 = read_manifest(spark, root, compacted)
        assert man2["applied_ids"] == ["a", "b", "c"]
        assert man2["max_ingest_seq"] == man["max_ingest_seq"] + 1 or (
            man2["max_ingest_seq"] >= man["max_ingest_seq"]
        )
        assert man2["schema"] is not None


def test_snapshot_delete_rewrites_only_matching_partitions(spark, tmp_path):
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_delete,
    )

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
                (110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m"),
                (50.0, 2.0, T0, "ETH-USDT", "coinbase", "15m"),
                (70.0, 1.0, T2, "BTC-USDT", "coinbase", "15m"),
            ],
        ),
        root,
    )
    v1 = current_version(spark, root)
    m1 = read_manifest(spark, root, v1)
    before = _state(read_snapshot(spark, root))

    v2, n = snapshot_delete(
        spark, root, F.col("open") >= 100.0, applied_id="gdpr-1"
    )
    assert (v2, n) == (v1 + 1, 2)
    after = _state(read_snapshot(spark, root))
    assert [r[3] for r in after] == [70.0, 50.0]  # sorted by symbol, date

    # untouched partitions (ETH day-1, BTC day-2) keep identical entries
    m2 = read_manifest(spark, root, v2)
    for p, files in m1["partitions"].items():
        if p.startswith("symbol=BTC-USDT") and "date=20240101" in p:
            assert m2["partitions"].get(p, []) != files
        else:
            assert m2["partitions"][p] == files

    # pre-delete version still time-travels (GDPR clock = vacuum)
    assert _state(read_snapshot(spark, root, version=v1)) == before

    # replay via the ledger: no-op, no version bump
    assert snapshot_delete(
        spark, root, F.col("open") >= 0.0, applied_id="gdpr-1"
    ) == (v2, 0)

    # no-match predicate: version unchanged
    assert snapshot_delete(spark, root, F.col("open") > 1e9) == (v2, 0)


def test_snapshot_delete_null_predicate_keeps_row(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL stay."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_delete,
    )

    root = str(tmp_path / "snap")
    df = _candles(
        spark,
        [
            (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
            (110.0, 1.0, T1, "BTC-USDT", "coinbase", "15m"),
        ],
    ).withColumn(
        "note",
        F.when(F.col("open") > 105.0, F.lit("hi")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    snapshot_upsert(spark, df, root)
    _, n = snapshot_delete(spark, root, F.col("note") != "hi")
    assert n == 0  # NULL != 'hi' is NULL, not TRUE — nothing deleted
    _, n = snapshot_delete(spark, root, F.col("note") == "hi")
    assert n == 1
    assert read_snapshot(spark, root).count() == 1


def test_snapshot_changes_cdc_feed(spark, tmp_path):
    """CDC between versions: inserts/updates/deletes tagged with the
    post-image; layout-only commits yield zero change rows."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        compact_snapshot,
        snapshot_changes,
        snapshot_delete,
    )

    root = str(tmp_path / "snap")
    v1 = snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
                (50.0, 2.0, T0, "ETH-USDT", "coinbase", "15m"),
            ],
        ),
        root,
    )
    # v2: update BTC@T0, insert BTC@T1; ETH partition untouched
    v2 = snapshot_upsert(
        spark,
        _candles(
            spark,
            [
                (200.0, 9.0, T0, "BTC-USDT", "coinbase", "15m"),
                (110.0, 1.0, T1, "BTC-USDT", "coinbase", "15m"),
            ],
        ),
        root,
    )
    ch = {
        (r.symbol, r.timestamp): (r._change_type, r.open)
        for r in snapshot_changes(spark, root, v1, v2).collect()
    }
    assert ch == {
        ("BTC-USDT", T0): ("update_postimage", 200.0),
        ("BTC-USDT", T1): ("insert", 110.0),
    }

    # v3: delete ETH row
    v3, n = snapshot_delete(spark, root, F.col("symbol") == "ETH-USDT")
    assert n == 1
    ch = {
        (r.symbol, r.timestamp): r._change_type
        for r in snapshot_changes(spark, root, v2, v3).collect()
    }
    assert ch == {("ETH-USDT", T0): "delete"}

    # v1 -> v3 composes: ETH delete + BTC update + BTC insert
    ch = {
        (r.symbol, r.timestamp): r._change_type
        for r in snapshot_changes(spark, root, v1, v3).collect()
    }
    assert ch == {
        ("ETH-USDT", T0): "delete",
        ("BTC-USDT", T0): "update_postimage",
        ("BTC-USDT", T1): "insert",
    }

    # layout-only commit: partitions rewritten, but NO content change
    v4 = compact_snapshot(spark, root, max_files_per_partition=0)
    if v4 is not None:
        assert snapshot_changes(spark, root, v3, v4).count() == 0


def test_snapshot_restore_rolls_back_without_data_movement(spark, tmp_path):
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_changes,
        snapshot_restore,
    )

    root = str(tmp_path / "snap")
    v1 = snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b1",
    )
    before = _state(read_snapshot(spark, root))
    v2 = snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b2",
    )
    v3 = snapshot_restore(spark, root, v1)
    assert v3 == v2 + 1
    assert _state(read_snapshot(spark, root)) == before
    # the rolled-back content is still time-travelable at v2
    assert _state(read_snapshot(spark, root, version=v2)) != before
    # CDC across the restore shows the revert as an update back
    ch = snapshot_changes(spark, root, v2, v3).collect()
    assert {r._change_type for r in ch} == {"update_postimage"}
    assert ch[0].open == 100.0
    # the ledger survives the restore: replaying b2 after the rollback
    # is a no-op — its data was REMOVED deliberately, not lost
    out = snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b2",
    )
    assert out == v3
    assert _state(read_snapshot(spark, root)) == before
    # a genuinely NEW batch still supersedes (seq high-water kept)
    snapshot_upsert(
        spark,
        _candles(spark, [(111.0, 2.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b3",
    )
    assert [r[3] for r in _state(read_snapshot(spark, root))] == [111.0]


def test_append_widens_schema_and_refuses_retype(spark, tmp_path):
    """ADVICE r5 (medium): the append path honors the same additive
    schema-evolution contract as upsert — new columns reach the manifest
    schema (so the explicit-schema read path keeps them), retypes raise."""
    from crypto_data_ingestion_module_spark.sinks.parquet_lake import PARTITION_COLS
    from crypto_data_ingestion_module_spark.sinks.snapshot import snapshot_append

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    wide = _candles(
        spark, [(110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m")]
    ).withColumn("venue_tier", F.lit("tier1")).withColumn(
        "date", F.date_format("timestamp", "yyyyMMdd")
    )
    snapshot_append(spark, root, wide, PARTITION_COLS)
    out = read_snapshot(spark, root)
    assert "venue_tier" in out.columns  # survived the explicit-schema read
    got = {r.timestamp: r.venue_tier for r in out.collect()}
    assert got == {T0: None, T1: "tier1"}

    retyped = wide.withColumn("venue_tier", F.lit(7))
    with pytest.raises(TypeError, match="venue_tier"):
        snapshot_append(spark, root, retyped, PARTITION_COLS)

    # a write partitioned differently from the lake is refused outright
    with pytest.raises(ValueError, match="partitioned by"):
        snapshot_append(spark, root, wide, ["date"])


def test_append_advances_seq_high_water(spark, tmp_path):
    """ADVICE r5: a merged/appended frame carrying _ingest_seq above the
    recorded high-water must raise max_ingest_seq, or a later upsert
    stamps a stale batch_seq and keep-last prefers old rows."""
    from crypto_data_ingestion_module_spark.operators.merge import INGEST_SEQ
    from crypto_data_ingestion_module_spark.sinks.parquet_lake import PARTITION_COLS
    from crypto_data_ingestion_module_spark.sinks.snapshot import snapshot_append

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )  # max_ingest_seq == 1
    carried = (
        _candles(spark, [(110.0, 1.5, T1, "BTC-USDT", "coinbase", "15m")])
        .withColumn(INGEST_SEQ, F.lit(100).cast("long"))
        .withColumn("date", F.date_format("timestamp", "yyyyMMdd"))
    )
    v = snapshot_append(spark, root, carried, PARTITION_COLS)
    assert read_manifest(spark, root, v)["max_ingest_seq"] == 100
    # the correction now stamps batch_seq 101 and wins keep-last
    snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.9, T1, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    got = {r.timestamp: r.open for r in read_snapshot(spark, root).collect()}
    assert got[T1] == 999.0


def test_cdc_ignores_ingest_seq_bookkeeping(spark, tmp_path):
    """ADVICE r5: re-upserting byte-identical business rows bumps only
    _ingest_seq; the CDC feed must emit zero logical changes."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import snapshot_changes

    root = str(tmp_path / "snap")
    rows = [
        (100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m"),
        (50.0, 2.0, T0, "ETH-USDT", "coinbase", "15m"),
    ]
    v1 = snapshot_upsert(spark, _candles(spark, rows), root)
    v2 = snapshot_upsert(spark, _candles(spark, rows), root)
    assert v2 == v1 + 1  # files did change (new _ingest_seq stamps)
    assert snapshot_changes(spark, root, v1, v2).count() == 0


def test_delete_threads_ts_col_for_rewritten_file_stats(spark, tmp_path):
    """ADVICE r5: deleting from a lake keyed on a non-default time axis
    keeps per-file time stats for the rewritten files (pruning intact)."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_append,
        snapshot_delete,
    )

    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(T0, "a", 1.0), (T1, "a", 2.0), (T2, "b", 3.0)],
        "bucket_ts timestamp, sym string, v double",
    ).withColumn("date", F.to_date("bucket_ts"))
    snapshot_append(spark, root, df, ["date"], ts_col="bucket_ts")
    v, n = snapshot_delete(
        spark,
        root,
        F.col("sym") == "a",
        partition_cols=["date"],
        ts_col="bucket_ts",
    )
    assert n == 2
    man = read_manifest(spark, root, v)
    live = {f for fl in man["partitions"].values() for f in fl}
    assert live  # T2 row's partition survives (one rewritten, one kept)
    for f in live:
        assert f in man["file_stats"], f
        assert man["file_stats"][f]["ts_min_us"] > 0


def test_concurrent_writer_stress_with_reader_and_vacuum(spark, tmp_path):
    """VERDICT r5 item 4: N threads upserting disjoint AND overlapping
    partitions concurrently; a reader loop pins version monotonicity and
    never observes a torn snapshot; vacuum races a reader of an old
    version inside its retention window.  Every writer's row must land
    (optimistic retry recomputes a lost race against the new current
    snapshot — no write is silently dropped)."""
    import threading

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(
            spark,
            [(100.0 + i, 1.0, T0, f"S{i}-USDT", "coinbase", "15m")
             for i in range(4)],
        ),
        root,
    )

    n_writers = 8
    errors: list[BaseException] = []
    stop = threading.Event()

    def writer(i: int) -> None:
        # i % 4 → two threads share each symbol partition (overlap);
        # distinct timestamps → distinct logical keys, so a correct
        # retry loop preserves every row
        try:
            snapshot_upsert(
                spark,
                _candles(
                    spark,
                    [(1000.0 + i, 2.0, T0 + dt.timedelta(minutes=i + 1),
                      f"S{i % 4}-USDT", "coinbase", "15m")],
                ),
                root,
                retries=32,
            )
        except BaseException as e:  # surfaced after join
            errors.append(e)

    def reader() -> None:
        last_v = 0
        try:
            while not stop.is_set():
                v = current_version(spark, root)
                assert v is not None and v >= last_v, (v, last_v)
                last_v = v
                # a torn snapshot would read missing files or a row mix
                # from two versions; explicit-manifest reads make this a
                # hard failure rather than silent wrongness
                n = read_snapshot(spark, root, v).count()
                assert n >= 4, n
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    rt = threading.Thread(target=reader)
    rt.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rt.join()
    assert not errors, errors

    # every writer's row landed exactly once
    final = read_snapshot(spark, root)
    assert final.count() == 4 + n_writers
    opens = sorted(
        r.open for r in final.filter(F.col("timestamp") > T0).collect()
    )
    assert opens == [1000.0 + i for i in range(n_writers)]
    # the version chain is gap-free: one commit per successful write
    v_now = current_version(spark, root)
    for v in range(1, v_now + 1):
        assert read_manifest(spark, root, v)["version"] == v

    # vacuum racing a reader of an old version INSIDE the retention
    # window: keep=3 retains v_now-2..v_now; reading v_now-1 while
    # vacuum deletes pre-window files must succeed
    target = v_now - 1
    pre = read_snapshot(spark, root, target).count()
    results: list[int] = []

    def old_reader() -> None:
        try:
            for _ in range(5):
                results.append(read_snapshot(spark, root, target).count())
        except BaseException as e:
            errors.append(e)

    ot = threading.Thread(target=old_reader)
    ot.start()
    vacuum(spark, root, keep=3)
    ot.join()
    assert not errors, errors
    assert results == [pre] * 5
    # and the pre-window version is really gone (files collected)
    with pytest.raises(Exception):
        read_manifest(spark, root, 1)


def test_applied_ids_ledger_is_bounded(spark, tmp_path, monkeypatch):
    """VERDICT r6 item 3: the replay ledger is a retention HORIZON, not
    an O(all-batches-ever) list rewritten into every manifest — the
    commit path must stay O(retain) at streaming cadence."""
    import crypto_data_ingestion_module_spark.sinks.snapshot as snap

    monkeypatch.setattr(snap, "APPLIED_IDS_RETAIN", 8)

    # 1,000-commit loop over the ledger fold itself: bounded throughout
    man = {"applied_ids": [], "applied_ids_evicted": 0}
    for i in range(1000):
        ids, evicted, _frozen = snap._applied_ids_next(man, f"batch-{i:04d}")
        man = {"applied_ids": ids, "applied_ids_evicted": evicted}
        assert len(man["applied_ids"]) <= 8
    assert man["applied_ids"] == [f"batch-{i:04d}" for i in range(992, 1000)]
    assert man["applied_ids_evicted"] == 992

    # integration: a real lake under commit pressure keeps a bounded
    # arrival-ordered ledger and still rejects an IN-horizon duplicate
    # after older ids have been evicted
    root = str(tmp_path / "snap")
    for i in range(12):
        snapshot_upsert(
            spark,
            _candles(
                spark, [(float(i), 1.0, T0, "BTC-USDT", "coinbase", "15m")]
            ),
            root,
            applied_id=f"b{i:02d}",
        )
    v = current_version(spark, root)
    man = read_manifest(spark, root, v)
    assert man["applied_ids"] == [f"b{i:02d}" for i in range(4, 12)]
    assert man["applied_ids_evicted"] == 4
    out = snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b05",
    )
    assert out == v  # replay: no version bump
    assert not any(
        o == 999.0 for (_, _, _, o, _) in _state(read_snapshot(spark, root))
    )


def test_evicted_applied_id_reapplies_and_keep_last_absorbs(
    spark, tmp_path, monkeypatch
):
    """Beyond the horizon the ledger forgets: a replay of an EVICTED id
    re-applies (documented contract) — and on the upsert path keep-last
    absorbs it, so lake content stays correct as long as the true replay
    window fits inside APPLIED_IDS_RETAIN."""
    import crypto_data_ingestion_module_spark.sinks.snapshot as snap

    monkeypatch.setattr(snap, "APPLIED_IDS_RETAIN", 2)
    root = str(tmp_path / "snap")
    for i, aid in enumerate(["b0", "b1", "b2", "b3"]):
        snapshot_upsert(
            spark,
            _candles(
                spark, [(100.0 + i, 1.0, T0, "BTC-USDT", "coinbase", "15m")]
            ),
            root,
            applied_id=aid,
        )
    v = current_version(spark, root)
    assert read_manifest(spark, root, v)["applied_ids"] == ["b2", "b3"]
    # b0 was evicted: its replay is NOT deduplicated (version bumps) but
    # its stale payload carries a fresh higher batch_seq, so keep-last
    # keeps the lake at the replayed payload — idempotent content only
    # if the payload is idempotent; the retention horizon is the real
    # exactly-once boundary and must cover the delivery replay window.
    out = snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="b0",
    )
    assert out == v + 1


def test_legacy_sorted_ledger_is_frozen_not_truncated(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7: a pre-horizon manifest stored its applied_ids SORTED,
    so 'newest N' truncation on the transition commit would actually
    evict the lexicographically smallest ids — possibly recent ones,
    whose replay would then re-apply.  The transition must freeze the
    inherited ledger whole and bound only post-transition arrivals."""
    import crypto_data_ingestion_module_spark.sinks.snapshot as snap

    monkeypatch.setattr(snap, "APPLIED_IDS_RETAIN", 4)

    # legacy manifest: oversized SORTED ledger, no eviction bookkeeping
    legacy_ids = sorted(f"job-{i:03d}" for i in range(10))
    man = {"applied_ids": legacy_ids}
    ids, evicted, frozen = snap._applied_ids_next(man, "zz-new-1")
    assert frozen == 10
    assert ids[:10] == legacy_ids  # nothing legacy evicted
    assert ids[10:] == ["zz-new-1"]
    assert evicted == 0

    # subsequent bounded commits evict ONLY post-transition arrivals
    man = {
        "applied_ids": ids,
        "applied_ids_evicted": evicted,
        "applied_ids_frozen_n": frozen,
    }
    for i in range(2, 9):
        ids, evicted, frozen = snap._applied_ids_next(man, f"zz-new-{i}")
        man = {
            "applied_ids": ids,
            "applied_ids_evicted": evicted,
            "applied_ids_frozen_n": frozen,
        }
    assert man["applied_ids"][:10] == legacy_ids  # frozen prefix intact
    assert man["applied_ids"][10:] == [f"zz-new-{i}" for i in range(5, 9)]
    assert man["applied_ids_evicted"] == 4  # zz-new-1..4 aged out

    # integration: commit over a real legacy manifest — every frozen id
    # still dedupes a replay afterwards
    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="m0",
    )
    v = current_version(spark, root)
    old = read_manifest(spark, root, v)
    legacy = {
        k: val
        for k, val in old.items()
        if k not in ("applied_ids_evicted", "applied_ids_frozen_n")
    }
    legacy["applied_ids"] = sorted(legacy_ids + ["m0"])
    legacy["version"] = v + 1
    commit_version(spark, root, legacy, v + 1)
    for i in range(6):  # push well past RETAIN=4
        snapshot_upsert(
            spark,
            _candles(
                spark, [(200.0 + i, 1.0, T0, "BTC-USDT", "coinbase", "15m")]
            ),
            root,
            applied_id=f"zz-post-{i}",
        )
    v2 = current_version(spark, root)
    man2 = read_manifest(spark, root, v2)
    assert man2["applied_ids_frozen_n"] == 11
    assert set(legacy_ids) <= set(man2["applied_ids"])
    # a replay of ANY legacy-era id is still a no-op
    out = snapshot_upsert(
        spark,
        _candles(spark, [(999.0, 9.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
        applied_id="job-000",
    )
    assert out == v2
    assert not any(
        o == 999.0 for (_, _, _, o, _) in _state(read_snapshot(spark, root))
    )


def test_beyond_horizon_replay_contract_upsert_and_append(
    spark, tmp_path, monkeypatch
):
    """VERDICT r7 item 7: drive a replay from BEYOND the retention
    horizon through both write paths and pin the documented contract —
    upsert: keep-last absorbs the re-apply, content stays idempotent for
    an idempotent payload; append: the batch duplicates (visible rows),
    which is exactly what APPLIED_IDS_RETAIN's docstring promises."""
    import crypto_data_ingestion_module_spark.sinks.snapshot as snap
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_append,
    )

    monkeypatch.setattr(snap, "APPLIED_IDS_RETAIN", 2)

    # --- upsert path -------------------------------------------------
    root_u = str(tmp_path / "up")
    b0 = _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")])
    snapshot_upsert(spark, b0, root_u, applied_id="b0")
    for i, aid in enumerate(["b1", "b2", "b3"]):  # evicts b0 (horizon=2)
        snapshot_upsert(
            spark,
            _candles(
                spark, [(200.0 + i, 1.0, T1, "BTC-USDT", "coinbase", "15m")]
            ),
            root_u,
            applied_id=aid,
        )
    v = current_version(spark, root_u)
    assert "b0" not in read_manifest(spark, root_u, v)["applied_ids"]
    before = _state(read_snapshot(spark, root_u))
    out = snapshot_upsert(spark, b0, root_u, applied_id="b0")  # replay
    assert out == v + 1  # re-applied, not deduplicated
    # identical payload, keep-last key (symbol, timestamp): content is
    # byte-for-byte what it was — idempotent output
    assert _state(read_snapshot(spark, root_u)) == before

    # --- append path -------------------------------------------------
    root_a = str(tmp_path / "ap")
    a0 = _candles(spark, [(500.0, 5.0, T0, "BTC-USDT", "coinbase", "15m")])
    from crypto_data_ingestion_module_spark.sinks.parquet_lake import (
        _with_date,
    )

    a0 = _with_date(a0)
    pcols = ("date",)
    snapshot_append(spark, root_a, a0, partition_cols=pcols, applied_id="a0")
    for i, aid in enumerate(["a1", "a2", "a3"]):  # evicts a0
        snapshot_append(
            spark,
            root_a,
            _with_date(
                _candles(
                    spark,
                    [(600.0 + i, 1.0, T1, "BTC-USDT", "coinbase", "15m")],
                )
            ),
            partition_cols=pcols,
            applied_id=aid,
        )
    n_before = read_snapshot(spark, root_a).count()
    # in-horizon replay: still a no-op
    va = current_version(spark, root_a)
    assert (
        snapshot_append(
            spark,
            root_a,
            _with_date(
                _candles(
                    spark,
                    [(602.0, 1.0, T1, "BTC-USDT", "coinbase", "15m")],
                )
            ),
            partition_cols=pcols,
            applied_id="a3",
        )
        == va
    )
    assert read_snapshot(spark, root_a).count() == n_before
    # beyond-horizon replay: re-applies — DOCUMENTED duplication
    snapshot_append(spark, root_a, a0, partition_cols=pcols, applied_id="a0")
    after = read_snapshot(spark, root_a)
    assert after.count() == n_before + 1
    assert after.where(F.col("open") == 500.0).count() == 2


def test_legacy_manifest_heals_max_ingest_seq_with_lake_wide_max(
    spark, tmp_path
):
    """ADVICE r6: a legacy manifest (no max_ingest_seq) heals onto the
    manifest fast path at the next merge/append commit — with the
    LAKE-WIDE max, not the frame's own.  A frame covers only its touched
    partitions, so its max can understate seqs living elsewhere; a later
    upsert's batch_seq = healed+1 would then stamp new rows BELOW live
    ones and keep-last would prefer stale data."""
    from crypto_data_ingestion_module_spark.operators.merge import INGEST_SEQ
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_append,
    )

    root = str(tmp_path / "snap")
    snapshot_upsert(
        spark,
        _candles(spark, [(100.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    snapshot_upsert(
        spark,
        _candles(spark, [(110.0, 1.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    v = current_version(spark, root)
    man = read_manifest(spark, root, v)
    lake_hi = int(man["max_ingest_seq"])
    assert lake_hi >= 1
    # simulate a legacy lake: strip the high-water key from the manifest
    legacy = {k: val for k, val in man.items() if k != "max_ingest_seq"}
    legacy["version"] = v + 1
    commit_version(spark, root, legacy, v + 1)
    assert read_manifest(spark, root, v + 1).get("max_ingest_seq") is None
    # append into a DIFFERENT partition with a deliberately LOW seq
    from crypto_data_ingestion_module_spark.sinks.parquet_lake import (
        _with_date,
    )

    low = _with_date(
        _candles(spark, [(200.0, 1.0, T2, "BTC-USDT", "coinbase", "15m")])
    ).withColumn(INGEST_SEQ, F.lit(0).cast("long"))
    v2 = snapshot_append(spark, root, low, partition_cols=man["partition_cols"])
    healed = read_manifest(spark, root, v2)["max_ingest_seq"]
    assert healed == lake_hi  # lake-wide, not the frame's 0
    # and the fast path now yields a batch_seq that supersedes live rows
    snapshot_upsert(
        spark,
        _candles(spark, [(300.0, 3.0, T0, "BTC-USDT", "coinbase", "15m")]),
        root,
    )
    got = _state(read_snapshot(spark, root))
    assert any(ts == T0 and o == 300.0 for (_, _, ts, o, _) in got)


def test_snapshot_overwrite_replaces_everything_and_keeps_ledger(
    spark, tmp_path
):
    """INSERT OVERWRITE: one atomic manifest swap replaces the whole
    table — no partition of the old content survives — while the replay
    ledger carries across, so a re-delivered refresh commits nothing."""
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        snapshot_overwrite,
    )

    root = str(tmp_path / "art")
    a = spark.range(5).withColumn("shard", F.lit("all"))
    v1 = snapshot_overwrite(spark, root, a, ("shard",), applied_id="fp-1")
    assert v1 == 1
    b = spark.range(100, 102).withColumn("shard", F.lit("all"))
    v2 = snapshot_overwrite(spark, root, b, ("shard",), applied_id="fp-2")
    assert v2 == 2
    got = sorted(r.id for r in read_snapshot(spark, root).collect())
    assert got == [100, 101]  # old rows gone wholly
    man = read_manifest(spark, root, v2)
    assert man["applied_ids"] == ["fp-1", "fp-2"]
    # replayed refresh: no version bump, content untouched
    c = spark.range(999, 1000).withColumn("shard", F.lit("all"))
    out = snapshot_overwrite(spark, root, c, ("shard",), applied_id="fp-2")
    assert out == v2
    assert current_version(spark, root) == v2
    # time travel still serves the pre-overwrite snapshot
    old = sorted(r.id for r in read_snapshot(spark, root, v1).collect())
    assert old == [0, 1, 2, 3, 4]


def test_publish_if_absent_never_replaces_a_landed_manifest(spark, tmp_path):
    """The commit linearization point (ADVICE-class r15 finding, caught
    by the writer-stress test under full-suite load): Hadoop's LOCAL
    rename is a client-side exists-check + POSIX rename(2), and
    rename(2) silently REPLACES an existing destination — two commit
    racers could both pass the check inside Hadoop's rename and both
    "succeed", the second replacing the first's manifest with no error
    anywhere (one upsert lost).  The publish is now link(2)-based on
    file: schemes: publishing onto an existing final must raise
    CommitConflict and leave the landed manifest byte-identical."""
    import pytest as _pytest

    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        CommitConflict,
        _fs,
        _publish_if_absent,
    )

    vdir = str(tmp_path / "_versions")
    Path, fs = _fs(spark, vdir)
    fs.mkdirs(Path(vdir))

    def _write(name, payload):
        p = Path(f"{vdir}/{name}")
        out = fs.create(p, True)
        try:
            out.write(payload)
        finally:
            out.close()
        return p

    final = _write("v00000001.json", b'{"winner": "A"}')
    # a racer that already passed commit_version's exists-check now
    # publishes its own tmp onto the same final
    tmp = _write(".tmp-racer.json", b'{"loser": "B"}')
    with _pytest.raises(CommitConflict):
        _publish_if_absent(spark, fs, tmp, final)
    # the landed manifest is untouched and the loser's tmp is cleaned up
    assert open(f"{vdir}/v00000001.json", "rb").read() == b'{"winner": "A"}'
    assert not fs.exists(Path(f"{vdir}/.tmp-racer.json"))
    # and a publish onto a genuinely absent final still lands
    tmp2 = _write(".tmp-c.json", b'{"winner": "C"}')
    final2 = Path(f"{vdir}/v00000002.json")
    _publish_if_absent(spark, fs, tmp2, final2)
    assert open(f"{vdir}/v00000002.json", "rb").read() == b'{"winner": "C"}'
