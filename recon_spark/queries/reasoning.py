"""Ontology-reasoning query registry: RDFS entailment materialization
and SHACL-lite shape validation over the canonical KG.

These close the KG-construction loop the north rule describes: after
extraction -> linking -> canonicalization, a real triple factory (a)
materializes the schema closure so consumers query inferred facts
without a per-query reasoner, and (b) publishes a violation report
gating what reaches the final tables.

Oracle notes: the subPropertyOf/subClassOf closures run in DuckDB's
WITH RECURSIVE engine — an independent fixpoint implementation — while
the Spark side closes the (schema-sized, broadcast) T-Box driver-side
and applies it with broadcast joins. Both sides share the ONTOLOGY and
SHAPES constants (operators/reasoning.py), so the rule SET is pinned
while the evaluation strategies stay disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recon_spark.operators.reasoning import (
    TYPE_PRED,
    rdfs_entail,
    shape_violations,
    sql_entailed_cte,
    sql_shape_violations,
)
from recon_spark.queries.graph import _canonical_kg, _sql_canonical_kg


def _entailed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rdfs_entail(spark, _canonical_kg(spark, sf_dir))


def q_rdfs_entailment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full RDFS closure of the canonical KG: asserted triples plus
    subPropertyOf-propagated assertions plus domain/range/subClassOf
    type inferences (rules rdfs2/3/5/7/9/11)."""
    return _entailed(spark, sf_dir)


SQL_RDFS_ENTAILMENT = f"""
WITH RECURSIVE {_sql_canonical_kg()},
{sql_entailed_cte()}
SELECT subj, pred, obj FROM ent
"""


def q_rdfs_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inferred (entity, class) assignments — the typed-entity dimension
    a KG browser or embedding trainer consumes; distinct pairs."""
    return (
        _entailed(spark, sf_dir)
        .where(F.col("pred") == TYPE_PRED)
        .select(F.col("subj").alias("node"), F.col("obj").alias("cls"))
    )


SQL_RDFS_TYPES = f"""
WITH RECURSIVE {_sql_canonical_kg()},
{sql_entailed_cte()}
SELECT subj AS node, obj AS cls FROM ent WHERE pred = '{TYPE_PRED}'
"""


def q_shape_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite validation report over the entailed graph: minCount /
    maxCount / sh:class / typed-ness shapes, one row per violation."""
    return shape_violations(_entailed(spark, sf_dir))


SQL_SHAPE_VIOLATIONS = f"""
WITH RECURSIVE {_sql_canonical_kg()},
{sql_entailed_cte()}
{sql_shape_violations()}
"""


QUERIES = {
    "rdfs_entailment": q_rdfs_entailment,
    "rdfs_types": q_rdfs_types,
    "shape_violations": q_shape_violations,
}

ORACLES = {
    "rdfs_entailment": SQL_RDFS_ENTAILMENT,
    "rdfs_types": SQL_RDFS_TYPES,
    "shape_violations": SQL_SHAPE_VIOLATIONS,
}
