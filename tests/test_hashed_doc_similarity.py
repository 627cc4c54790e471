"""r18 scale-gate pins for hashed_doc_similarity (VERDICT r17 item 1).

The r17 closure-matrix kernel collects the query-side weights to the
driver; the query set is 1% of ALL documents, so r18 gates the collect
behind ``SPARK_GRAFT_HDS_CLOSURE_MAX`` and keeps the r16 inverted-index
join as the at-scale path.  The gate only changes the physical shape —
these tests pin that both paths produce bit-identical rows, and that
the env bound is read per call (not at import).
"""

from __future__ import annotations

import os
import struct

import pytest

SF = "/root/testdata/sf0.001"


def _rows(spark, sf):
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS

    out = QUERY_SPECS["hashed_doc_similarity"].spark(spark, sf).collect()
    return sorted(
        (r.qid, r.nid, r.rank, struct.pack("d", r.cosine)) for r in out
    )


@pytest.mark.parametrize("sf", [SF, "/root/testdata/sf0.01"])
def test_join_fallback_bit_parity_with_kernel(spark, sf):
    env = "SPARK_GRAFT_HDS_CLOSURE_MAX"
    saved = os.environ.get(env)
    try:
        os.environ[env] = "1000000000"  # force the closure-kernel path
        kernel_rows = _rows(spark, sf)
        os.environ[env] = "0"  # force the r16 join fallback
        join_rows = _rows(spark, sf)
    finally:
        if saved is None:
            os.environ.pop(env, None)
        else:
            os.environ[env] = saved
    assert kernel_rows == join_rows and len(kernel_rows) > 0


def test_env_bound_read_per_call():
    # ADVICE r17 item 4 pattern: configuring the bound after import
    # must take effect (no import-time snapshot).
    import crypto_data_ingestion_module_spark.plans.queries  # noqa: F401  (registers extensions; extensions must not be imported first)
    from crypto_data_ingestion_module_spark.plans import extensions as ext

    env = "SPARK_GRAFT_HDS_CLOSURE_MAX"
    saved = os.environ.get(env)
    try:
        os.environ[env] = "17"
        assert ext._hds_closure_max() == 17
        os.environ.pop(env)
        assert ext._hds_closure_max() == 262144
    finally:
        if saved is not None:
            os.environ[env] = saved
