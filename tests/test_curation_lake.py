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

    # a stale sibling SEMANTIC version dir is pruned on publish
    import os

    fam_dir = os.path.join(str(tmp_path / "artifacts"), "fam")
    os.makedirs(os.path.join(fam_dir, "v0-old"), exist_ok=True)
    fps["fp"] = "fp-3"
    ext._serve_artifact(spark, SF_SMALL, "fam", "v1", build)
    assert not os.path.exists(os.path.join(fam_dir, "v0-old"))
