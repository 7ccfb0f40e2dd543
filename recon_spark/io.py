"""IO: Prodigy-format JSONL readers/writers + schema validation gate.

Reference: read_jsonl/read_json + json_to_examples
(/root/reference/recon/loaders.py:18-55) — load annotation-tool exports
into the typed Example shape, materializing missing span text from the
offsets (the pydantic ``span_text_exists`` validator,
/root/reference/recon/types.py:85-96); Dataset.to_disk/from_disk jsonl
round-trip (recon/dataset.py:323-425).

Spark shape: ``spark.read.schema(...).json`` with an explicit nested
schema (never schema inference on a 100 TB ingest), then pure JVM
column expressions for the validator — missing span.text becomes
substring(text, start+1, end-start); rows violating the offset
invariant are quarantined, not dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from recon_spark.schema import SPAN_STRUCT, TOKEN_STRUCT
from recon_spark.operators.validation import span_offsets_valid

# Prodigy jsonl rows: {text, spans: [{text?, start, end, label}], meta?, tokens?}
PRODIGY_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("tokens", T.ArrayType(TOKEN_STRUCT)),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Load Prodigy-format JSONL into the examples shape, materializing
    missing span surfaces from offsets (the span-text validator as a
    higher-order transform)."""
    raw = spark.read.schema(PRODIGY_SCHEMA).json(path)
    fill = """
    transform(coalesce(spans, CAST(array() AS ARRAY<STRUCT<
        text: STRING, start: INT, end: INT, label: STRING,
        token_start: INT, token_end: INT, kb_id: STRING, source: STRING>>)),
      s -> named_struct(
        'text', coalesce(s.text, substring(text, s.start + 1, s.end - s.start)),
        'start', s.start, 'end', s.end, 'label', s.label,
        'token_start', s.token_start, 'token_end', s.token_end,
        'kb_id', s.kb_id, 'source', s.source))
    """
    return raw.withColumn("spans", F.expr(fill))


def split_valid_invalid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Quarantine split on the span-offset invariant: (valid, invalid).
    The reference raises at parse time (pydantic); at ingest scale we
    route violations to a side table instead."""
    ok = span_offsets_valid()
    return df.where(ok), df.where(~ok)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Examples -> JSONL (Dataset.to_disk analog)."""
    df.write.mode(mode).json(path)
