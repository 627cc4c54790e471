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
