"""Spark-vs-DuckDB parity for the extra query family (overlap
resolution, sentence splitting, strip round-trip, tokenization stats,
deterministic augmentation, dedup clustering, LSH ANN, search)."""

import pytest

from recon_spark.queries.extra import ORACLES, QUERIES
from tests.conftest import SF_SMOKE, compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_extra_query_matches_oracle(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name], SF_SMOKE)
