"""Every registered QuerySpec must match its DuckDB oracle exactly.

This mirrors the driver's CORRECTNESS gate (row-count + schema +
order-insensitive values) at sf0.001 for speed; the driver runs sf0.01.
"""

import pytest

from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS
from tests.conftest import SF_SMALL
from tests.oracle_harness import check_query


@pytest.mark.parametrize("name", sorted(QUERY_SPECS))
def test_query_matches_oracle(spark, name):
    rows = check_query(spark, name, SF_SMALL)
    assert rows >= 0


def test_all_specs_have_descriptions():
    for name, spec in QUERY_SPECS.items():
        assert spec.description, name
        assert spec.survey_ids, name
