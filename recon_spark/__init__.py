"""recon_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
library ``kabirkhan/recon`` (NER-data debugging: span validation, dataset
stats, label-consistency insights, bulk corrections, lineage) generalized
into a distributed KG-construction pipeline (mention detection → SVO triple
extraction → entity linking → canonicalization → partitioned triple tables)
plus the dedup / similarity / text-quality operators a web-scale
training-data pipeline needs.

Design stance (see SURVEY.md §7):
- pyspark.sql DataFrames everywhere; zero per-row Python on the hot path.
- Span edits via higher-order functions (transform/filter/aggregate).
- Model-ish work (mention detection, tokenize) via Arrow-vectorized
  pandas UDFs.
- Explicit partitioning story: url-hash bucketing for extraction, salted
  two-stage aggregation for head-entity skew, broadcast joins for small
  dimension tables (corrections, alias dictionaries).
"""

__version__ = "0.1.0"
