"""Spark-vs-DuckDB parity for every core query (mirrors the driver's
correctness gate: row count + schema + order-insensitive values)."""

import pytest

from recon_spark.queries.core import ORACLES, QUERIES
from tests.conftest import SF_SMOKE, compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_core_query_matches_oracle(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name], SF_SMOKE)
