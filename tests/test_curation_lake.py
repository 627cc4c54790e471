"""Materialized-cluster curation must equal the inline registered query."""

from crypto_data_ingestion_module_spark.operators.curation import (
    curated_corpus,
    materialize_clusters,
    read_clusters,
)
from crypto_data_ingestion_module_spark.operators.text_dedup import (
    simhash_hamming_pairs,
)
from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS
from crypto_data_ingestion_module_spark.session import load_table
from tests.conftest import SF_SMALL


def test_curated_from_lake_equals_inline(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "clusters")
    materialize_clusters(docs, simhash_hamming_pairs(docs), path)

    clusters = read_clusters(spark, path)
    # thin schema: one row per doc, exactly one representative per cluster
    assert clusters.count() == docs.count()
    reps = clusters.filter("is_rep").count()
    assert reps == clusters.select("cluster_id").distinct().count()

    from_lake = {
        tuple(r) for r in curated_corpus(docs, clusters).collect()
    }
    # the registered query IS the lake path now; the inline CC twin is
    # the independent recomputation both must equal
    from crypto_data_ingestion_module_spark.plans.extensions import (
        _curated_q_inline,
    )

    inline = {
        tuple(r) for r in _curated_q_inline(spark, SF_SMALL).collect()
    }
    registered = {
        tuple(r)
        for r in QUERY_SPECS["curated_corpus"].spark(spark, SF_SMALL).collect()
    }
    assert from_lake == inline
    assert registered == inline


def test_serve_artifact_lake_refresh_and_replay(spark, tmp_path, monkeypatch):
    """The serving-artifact protocol is the snapshot lake (VERDICT r6
    item 4): first access builds + commits v1; a same-fingerprint access
    serves the committed snapshot WITHOUT rebuilding; a fingerprint
    change triggers exactly one overwrite commit whose content replaces
    the old artifact wholly."""
    import crypto_data_ingestion_module_spark.plans.extensions as ext
    from crypto_data_ingestion_module_spark.sinks.snapshot import (
        current_version,
        read_manifest,
    )

    monkeypatch.setattr(ext, "_ARTIFACTS_ROOT", str(tmp_path / "artifacts"))
    fps = {"fp": "fp-1"}
    monkeypatch.setattr(ext, "_data_fingerprint", lambda sf_dir: fps["fp"])

    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(3).withColumn("payload", F.lit(builds["n"]))

    from pyspark.sql import functions as F

    got = ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 1
    assert got.columns == ["id", "payload"]  # shard col is internal
    assert {r.payload for r in got.collect()} == {1}

    # same fingerprint: served from the lake, no rebuild
    again = ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 1
    assert {r.payload for r in again.collect()} == {1}

    root = ext._artifact_lake_root(SF_SMALL, "fam", "v1")
    v = current_version(spark, root)
    assert read_manifest(spark, root, v)["applied_ids"] == ["fp-1#v1"]

    # data regenerated in place: one overwrite commit, content replaced
    fps["fp"] = "fp-2"
    fresh = ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 2
    assert {r.payload for r in fresh.collect()} == {2}
    v2 = current_version(spark, root)
    assert v2 > v
    assert read_manifest(spark, root, v2)["applied_ids"][-1] == f"fp-2#v{v2}"

    # fingerprint REVERTS to an earlier value (testdata restored from a
    # backup / mtime-preserving copy): the old fp still sits in the
    # replay ledger, but the CURRENT content was built from fp-2 — the
    # serve must rebuild, not serve the fp-2 artifact forever (ADVICE r7)
    fps["fp"] = "fp-1"
    reverted = ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 3
    assert {r.payload for r in reverted.collect()} == {3}
    # and the rebuild actually COMMITTED (a bare-fp applied_id would be
    # deduped by ledger membership and keep serving stale content)
    v3 = current_version(spark, root)
    assert v3 > v2
    # subsequent same-fingerprint access serves without rebuilding
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 3

    # a stale sibling SEMANTIC version dir is pruned with a ONE-
    # GENERATION deferral (VERDICT r8 item 6): the refresh that first
    # sees it only marks it — a concurrent reader that started on the
    # old version gets a full refresh generation to finish — and the
    # NEXT refresh deletes it.
    import os

    fam_dir = os.path.join(str(tmp_path / "artifacts"), "fam")
    os.makedirs(os.path.join(fam_dir, "v0-old"), exist_ok=True)
    fps["fp"] = "fp-3"
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert os.path.exists(os.path.join(fam_dir, "v0-old")), (
        "sibling version must survive the refresh that discovers it"
    )
    assert os.path.exists(os.path.join(fam_dir, "v0-old", "_prune_pending"))
    fps["fp"] = "fp-4"
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert not os.path.exists(os.path.join(fam_dir, "v0-old"))


def test_serve_artifact_frozen_legacy_ledger_rebuilds_once(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8: on a pre-horizon legacy lake the frozen ledger is
    SORTED, so ids[-1] is the lexicographically largest id, not the
    newest commit — a fingerprint revert matching it must NOT serve the
    (stale) live artifact.  While the ledger has no post-transition
    arrival-ordered entry, the serve check is skipped: one rebuild
    stamps a salted arrival-ordered id, after which serving resumes."""
    import json
    import os

    import crypto_data_ingestion_module_spark.plans.extensions as ext
    from pyspark.sql import functions as F

    monkeypatch.setattr(ext, "_ARTIFACTS_ROOT", str(tmp_path / "artifacts"))
    fps = {"fp": "fp-z"}
    monkeypatch.setattr(ext, "_data_fingerprint", lambda sf_dir: fps["fp"])
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(3).withColumn("payload", F.lit(builds["n"]))

    # live content ends up built from fp-a; ledger holds both ids
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    fps["fp"] = "fp-a"
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 2

    # rewrite the head manifest as a pre-horizon legacy one: ledger
    # SORTED, no applied_ids_evicted / applied_ids_frozen_n keys —
    # lexicographic order puts the STALE fp-z id last even though the
    # live snapshot was built from fp-a
    root = ext._artifact_lake_root(SF_SMALL, "fam", "v1")
    vdir = os.path.join(root, "_versions")
    head = sorted(os.listdir(vdir))[-1]
    mpath = os.path.join(vdir, head)
    with open(mpath) as fh:
        man = json.load(fh)
    man["applied_ids"] = sorted(man["applied_ids"])
    man.pop("applied_ids_evicted", None)
    man.pop("applied_ids_frozen_n", None)
    assert man["applied_ids"][-1].startswith("fp-z")
    with open(mpath, "w") as fh:
        json.dump(man, fh, sort_keys=True)
    # drop the Hadoop local-FS checksum shadow — the direct rewrite
    # above invalidated it and read_manifest goes through Hadoop
    crc = os.path.join(vdir, f".{head}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # data reverts to fp-z: ids[-1] matches, but on an all-frozen
    # ledger that signal is meaningless — must REBUILD (old code served
    # the fp-a artifact here)
    fps["fp"] = "fp-z"
    got = ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 3
    assert {r.payload for r in got.collect()} == {3}

    # the rebuild stamped an arrival-ordered salted id: serving now
    # works again without rebuilding
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert builds["n"] == 3
