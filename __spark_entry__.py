"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL per query (correctness gate).

All implementations live in recon_spark/; this module only adapts them
to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:  # driver may import us from any cwd
    sys.path.insert(0, _REPO_ROOT)

from recon_spark.deploy import ensure_pyfiles
from recon_spark.queries import ORACLES, QUERIES


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_pyfiles(spark)  # --py-files analog for a handed-in session
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the KG-construction slice — gazetteer mention detection
    (Arrow-vectorized), salted entity-coverage aggregation, top surfaces.
    """
    return _wrap(QUERIES["entity_coverage"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
