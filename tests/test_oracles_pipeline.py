"""Spark-vs-DuckDB parity for the training-data pipeline queries."""

import pytest

from recon_spark.queries.pipeline import ORACLES, QUERIES
from tests.conftest import SF_SMOKE, compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_pipeline_query_matches_oracle(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name], SF_SMOKE)
