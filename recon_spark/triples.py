"""The distributed triple factory: pages -> (subj, pred, obj) tables.

The end-to-end KG-construction pipeline (BASELINE.json north_star):

  pages(url, warc_ts, html, text, lang)
    -> url-hash bucketing (explicit repartition; Iceberg bucket(url)
       transform in production)
    -> Arrow-vectorized mention detection (operators.extraction)
    -> span-offset validation gate (operators.validation)
    -> JVM SVO triple extraction with char-offset provenance (below)
    -> canonicalization via broadcast alias dictionary (operators.linker)
    -> partitioned (subj, pred, obj) table, idempotent MERGE into a
       SnapshotStore (storage.py) with per-partition lineage + metrics

Checkpointed resume: the output merge is keyed on the triple's content
key, so re-running the job after a crash re-derives and inserts only
missing rows (0 added on a clean re-run) — the Iceberg MERGE INTO analog
of the reference's replay-pending-ops on load (recon/dataset.py:353-382).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recon_spark.gazetteer import PREDICATES
from recon_spark.operators.extraction import detect_mentions, entity_unigrams
from recon_spark.operators.linker import alias_df
from recon_spark.operators.validation import validate_span_offsets
from recon_spark.storage import SnapshotStore

_TOK_DDL = "ARRAY<STRUCT<w: STRING, s: INT, e: INT>>"


def extract_triples_spans(
    df: DataFrame, id_col: str = "page_id", text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """SVO triples with char-offset provenance, pure JVM per-row:
    consecutive token windows (subj ENT, pred, obj ENT) ->
    (url, subj, pred, obj, subj_span, obj_span). Zero shuffle."""
    uni = entity_unigrams()
    uni_arr = "array(" + ", ".join(f"'{s}'" for s in uni) + ")"
    pred_arr = "array(" + ", ".join(f"'{s}'" for s in PREDICATES) + ")"
    toks = f"""
    aggregate(
      split({text_col}, ' '),
      named_struct('pos', 0, 'ts', CAST(array() AS {_TOK_DDL})),
      (acc, w) -> named_struct(
        'pos', acc.pos + length(w) + 1,
        'ts', array_append(acc.ts, named_struct('w', w, 's', acc.pos, 'e', acc.pos + length(w)))),
      acc -> acc.ts
    )
    """
    trip = f"""
    filter(
      transform(
        CASE WHEN size(__toks) >= 3 THEN sequence(1, size(__toks) - 2)
             ELSE CAST(array() AS ARRAY<INT>) END,
        i -> named_struct(
          'subj', element_at(__toks, i).w,
          'pred', element_at(__toks, i + 1).w,
          'obj',  element_at(__toks, i + 2).w,
          'subj_span', named_struct('start', element_at(__toks, i).s,
                                    'end', element_at(__toks, i).e),
          'obj_span', named_struct('start', element_at(__toks, i + 2).s,
                                   'end', element_at(__toks, i + 2).e))
      ),
      t -> array_contains({uni_arr}, t.subj)
           AND array_contains({pred_arr}, t.pred)
           AND array_contains({uni_arr}, t.obj)
    )
    """
    return (
        df.withColumn("__toks", F.expr(toks))
        .select(id_col, url_col, F.explode(F.expr(trip)).alias("t"))
        .select(
            id_col,
            url_col,
            "t.subj",
            "t.pred",
            "t.obj",
            "t.subj_span",
            "t.obj_span",
        )
    )


def canonicalize_triples(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """Map subj/obj surfaces to canonical entity ids through the top-1
    alias candidate (broadcast); unlinkable surfaces keep their form."""
    best = (
        alias_df(spark)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("alias").orderBy(F.desc("score"), "entity_id")
            ),
        )
        .where("rk = 1")
        .select("alias", "entity_id")
    )
    t = (
        triples.join(
            F.broadcast(best).withColumnRenamed("entity_id", "subj_id"),
            triples.subj == F.col("alias"),
            "left",
        )
        .drop("alias")
    )
    t = t.join(
        F.broadcast(best).withColumnRenamed("entity_id", "obj_id"),
        t.obj == F.col("alias"),
        "left",
    ).drop("alias")
    return t.select(
        F.coalesce("subj_id", "subj").alias("subj"),
        "pred",
        F.coalesce("obj_id", "obj").alias("obj"),
        "url",
        "subj_span",
        "obj_span",
    )


def build_triples(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_parts: int = 16,
) -> dict:
    """Run the full pipeline and MERGE results into the triple store at
    out_dir. Returns metrics incl. per-partition counts and lineage.
    Idempotent: a second run over the same pages adds 0 rows."""
    bucketed = pages.repartition(n_parts, F.xxhash64("url"))  # url-hash bucketing
    with_mentions = detect_mentions(bucketed, id_col="page_id", text_col="text")
    validated = validate_span_offsets(with_mentions)  # the ingest gate
    raw = extract_triples_spans(validated)
    canon = canonicalize_triples(spark, raw)
    final = canon.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    ).withColumn(
        "triple_key",
        F.md5(
            F.concat_ws(
                "|", "url", "subj", "pred", "obj", F.col("subj_span.start").cast("string")
            )
        ),
    ).withColumn("content_hash", F.xxhash64("subj", "pred", "obj"))

    store = SnapshotStore(spark, out_dir, key_col="triple_key", hash_col="content_hash")
    res = store.merge(final, op_name="recon_spark.build_triples.v1")

    out = store.read()
    per_part = {
        int(r["part_id"]): int(r["n"])
        for r in out.groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "snapshot_id": res.snapshot_id,
        "added": res.added,
        "removed": res.removed,
        "changed": res.changed,
        "total_triples": out.count(),
        "per_partition": per_part,
        "n_partitions": n_parts,
    }
