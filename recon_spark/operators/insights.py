"""Insight operators: disagreement detection, prediction errors, hardness.

Reference: /root/reference/recon/insights.py — get_ents_by_label (:19-44),
get_label_disparities (:47-71), top_label_disparities (:74-110),
top_prediction_errors (:113-236), get_hardest_examples (:239-290),
get_annotation_labels (:293-315).

Shapes: self-join / intersect for disparities; full-outer span join +
CASE classification for prediction errors; join + per-doc agg + global
min-max for hardest examples. All sort-descending outputs carry
deterministic tiebreakers (the reference relies on Python stable sort;
Spark sorts are not stable across partitions — SURVEY.md §7.3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recon_spark.schema import NOT_LABELED


def ents_by_label(mentions: DataFrame, case_sensitive: bool = False) -> DataFrame:
    """label → distinct surfaces (+ example docs): the index behind the
    disparity operators."""
    surface = F.col("surface") if case_sensitive else F.lower(F.col("surface"))
    return (
        mentions.select("label", surface.alias("surface"), "doc_id")
        .groupBy("label", "surface")
        .agg(F.collect_set("doc_id").alias("doc_ids"))
    )


def label_disparities(
    mentions: DataFrame, label1: str, label2: str, case_sensitive: bool = False
) -> DataFrame:
    """Surfaces annotated as BOTH label1 and label2 somewhere in the data
    (entity-disagreement detection). Pure set intersection."""
    surface = F.col("surface") if case_sensitive else F.lower(F.col("surface"))
    m = mentions.select(surface.alias("surface"), "label")
    s1 = m.where(F.col("label") == label1).select("surface").distinct()
    s2 = m.where(F.col("label") == label2).select("surface").distinct()
    return s1.intersect(s2).orderBy("surface")


def top_label_disparities(
    mentions: DataFrame, case_sensitive: bool = False, dedupe: bool = False
) -> DataFrame:
    """All label pairs with >0 shared surfaces, with the shared-surface
    count, sorted desc. dedupe=True halves the symmetric matrix
    (label1 < label2)."""
    surface = F.col("surface") if case_sensitive else F.lower(F.col("surface"))
    pairs = mentions.select(surface.alias("surface"), "label").distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    cond = (F.col("a.surface") == F.col("b.surface")) & (
        (F.col("a.label") < F.col("b.label"))
        if dedupe
        else (F.col("a.label") != F.col("b.label"))
    )
    return (
        a.join(b, cond)
        .groupBy(
            F.col("a.label").alias("label1"), F.col("b.label").alias("label2")
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "label1", "label2")
    )


def annotation_labels(mentions: DataFrame, case_sensitive: bool = False) -> DataFrame:
    """surface → per-label counts (long form): the input to
    most-common-label canonicalization."""
    surface = F.col("surface") if case_sensitive else F.lower(F.col("surface"))
    return (
        mentions.select(surface.alias("surface"), "label")
        .groupBy("surface", "label")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("surface", F.desc("count"), "label")
    )


def most_common_label_corrections(mentions: DataFrame) -> DataFrame:
    """Derive Recon-style corrections from label disagreements: for every
    surface annotated with >1 label, emit (annotation=surface,
    to_label=the most common label, ties broken by label asc). Feeding
    this into corrections.fix_annotations canonicalizes the dataset —
    the generalization of the reference's manual-correction workflow."""
    counts = annotation_labels(mentions)
    w = Window.partitionBy("surface").orderBy(F.desc("count"), "label")
    ranked = counts.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_labels", F.count(F.lit(1)).over(Window.partitionBy("surface"))
    )
    return (
        ranked.where((F.col("rk") == 1) & (F.col("n_labels") > 1))
        .select(
            F.col("surface").alias("annotation"),
            F.col("label").alias("to_label"),
            F.col("count").alias("support"),
        )
        .orderBy("annotation")
    )


def _span_keys(df_with_spans: DataFrame, id_col: str, spans_col: str) -> DataFrame:
    return df_with_spans.select(
        F.col(id_col).alias("doc_id"), F.explode(spans_col).alias("s")
    ).select(
        "doc_id",
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.label").alias("label"),
        F.col("s.text").alias("text"),
    )


def prediction_errors(
    gold: DataFrame,
    pred: DataFrame,
    id_col: str = "doc_id",
    gold_spans: str = "spans",
    pred_spans: str = "pred_spans",
) -> DataFrame:
    """Classify model errors by full-outer span join on (doc, start, end):
    same offsets + different label → label confusion; pred-only → false
    positive (true=NOT_LABELED); gold-only → false negative
    (pred=NOT_LABELED). Aggregated to (text, true_label, pred_label, n)
    sorted desc — reference top_prediction_errors semantics (its `seen`
    set dedupe of FN-after-confusion is exactly what the single join row
    gives for free)."""
    g = _span_keys(gold, id_col, gold_spans).withColumnRenamed("label", "gold_label")
    p = (
        _span_keys(pred, id_col, pred_spans)
        .withColumnRenamed("label", "pred_label")
        .withColumnRenamed("text", "pred_text")
    )
    j = g.join(p, ["doc_id", "start", "end"], "full_outer")
    errors = j.where(
        F.col("gold_label").isNull()
        | F.col("pred_label").isNull()
        | (F.col("gold_label") != F.col("pred_label"))
    ).select(
        F.coalesce("text", "pred_text").alias("text"),
        F.coalesce("gold_label", F.lit(NOT_LABELED)).alias("true_label"),
        F.coalesce("pred_label", F.lit(NOT_LABELED)).alias("pred_label"),
    )
    return (
        errors.groupBy("text", "true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "text", "true_label", "pred_label")
    )


def prediction_errors_colocated(
    df: DataFrame,
    gold_spans: str = "spans",
    pred_spans: str = "pred_spans",
) -> DataFrame:
    """prediction_errors when gold and pred span arrays share a row
    (the single-pipeline case): the (start,end) alignment is a per-row
    array comparison — zero explode, zero join, zero shuffle before the
    final small aggregate. Identical classification to the full-outer
    join (each (doc,start,end) occurs at most once per side), asserted
    against the same oracle."""
    err_ddl = "ARRAY<STRUCT<text: STRING, true_label: STRING, pred_label: STRING>>"
    errs = f"""
    filter(concat(
      transform({gold_spans}, g -> CASE
        WHEN NOT exists({pred_spans}, p -> p.start = g.start AND p.end = g.end)
          THEN named_struct('text', g.text, 'true_label', g.label,
                            'pred_label', '{NOT_LABELED}')
        WHEN NOT (try_element_at(filter({pred_spans},
               p -> p.start = g.start AND p.end = g.end), 1).label <=> g.label)
          THEN named_struct('text', g.text, 'true_label', g.label,
                            'pred_label', try_element_at(filter({pred_spans},
                              p -> p.start = g.start AND p.end = g.end), 1).label)
        ELSE CAST(NULL AS STRUCT<text: STRING, true_label: STRING, pred_label: STRING>)
        END),
      transform(
        filter({pred_spans},
               p -> NOT exists({gold_spans}, g -> g.start = p.start AND g.end = p.end)),
        p -> named_struct('text', p.text, 'true_label', '{NOT_LABELED}',
                          'pred_label', p.label))
    ), e -> e IS NOT NULL)
    """
    return (
        df.select(F.explode(F.expr(f"CAST({errs} AS {err_ddl})")).alias("e"))
        .select("e.text", "e.true_label", "e.pred_label")
        .groupBy("text", "true_label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "text", "true_label", "pred_label")
    )


def hardest_examples_colocated(
    df: DataFrame,
    id_col: str = "doc_id",
    gold_spans: str = "spans",
    pred_spans: str = "pred_spans",
) -> DataFrame:
    """hardest_examples with co-located span arrays: per-row tp/fp/fn
    via array predicates (no explode, no join), then the same global
    normalization. Empty-span docs are already rows, so no all-docs
    re-join is needed."""
    tp = (
        f"size(filter({gold_spans}, g -> exists({pred_spans}, "
        "p -> p.start = g.start AND p.end = g.end AND p.label = g.label)))"
    )
    fp = (
        f"size(filter({pred_spans}, p -> NOT exists({gold_spans}, "
        "g -> g.start = p.start AND g.end = p.end AND g.label = p.label)))"
    )
    fn = (
        f"size(filter({gold_spans}, g -> NOT exists({pred_spans}, "
        "p -> p.start = g.start AND p.end = g.end AND p.label = g.label)))"
    )
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        (F.expr(fp) + F.expr(fn)).cast("long").alias("count"),
        F.when(
            (F.size(gold_spans) > 0) & (F.size(pred_spans) > 0),
            F.when(
                (2 * F.expr(tp) + F.expr(fp) + F.expr(fn)) > 0,
                2.0 * F.expr(tp) / (2 * F.expr(tp) + F.expr(fp) + F.expr(fn)),
            ).otherwise(0.0),
        )
        .otherwise(1.0)
        .alias("fscore"),
    )
    # The three global scalars (max_count, lo, hi) are collected EAGERLY
    # against a transiently persisted score frame, then embedded as
    # literals: the returned plan references the subtree exactly once,
    # and the cache is released before returning (no session-lifetime
    # pin — callers in a loop previously accumulated one cached RDD per
    # call). Extraction executions: 1 while cached + 1 at caller
    # materialization, vs 3-4 for the unpersisted broadcast-agg chain.
    scored = scored.persist()
    try:
        max_count = scored.agg(F.max("count")).collect()[0][0] or 0
        raw_score = F.col("fscore") - F.col("count") / F.lit(
            max_count if max_count > 0 else 1
        )
        row = scored.agg(
            F.min(raw_score).alias("lo"), F.max(raw_score).alias("hi")
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
    finally:
        scored.unpersist()
    if lo is None or hi is None or not hi > lo:
        score = F.lit(0.0)
    else:
        score = F.round((raw_score - F.lit(lo)) / F.lit(hi - lo), 6)
    return scored.select(
        "doc_id", "count", score.alias("score")
    ).orderBy("score", "count", "doc_id")


def hardest_examples(
    docs: DataFrame,
    gold: DataFrame,
    pred: DataFrame,
    id_col: str = "doc_id",
    gold_spans: str = "spans",
    pred_spans: str = "pred_spans",
) -> DataFrame:
    """Per-document difficulty: PRF fscore over exact (start,end,label)
    matches, score 1.0 when either side has no spans, minus
    errors/max_errors, min-max normalized, sorted ascending (hardest
    first) with doc_id tiebreak — reference get_hardest_examples."""
    g = _span_keys(gold, id_col, gold_spans).withColumnRenamed("label", "gold_label")
    p = (
        _span_keys(pred, id_col, pred_spans)
        .withColumnRenamed("label", "pred_label")
        .withColumnRenamed("text", "pred_text")
    )
    j = g.join(p, ["doc_id", "start", "end"], "full_outer")
    per_doc = j.groupBy("doc_id").agg(
        F.sum(
            (F.col("gold_label") == F.col("pred_label")).cast("long")
        ).alias("tp"),
        F.sum(
            (
                F.col("pred_label").isNotNull()
                & (
                    F.col("gold_label").isNull()
                    | (F.col("gold_label") != F.col("pred_label"))
                )
            ).cast("long")
        ).alias("fp"),
        F.sum(
            (
                F.col("gold_label").isNotNull()
                & (
                    F.col("pred_label").isNull()
                    | (F.col("gold_label") != F.col("pred_label"))
                )
            ).cast("long")
        ).alias("fn"),
        F.max((F.col("gold_label").isNotNull()).cast("int")).alias("has_gold"),
        F.max((F.col("pred_label").isNotNull()).cast("int")).alias("has_pred"),
    )
    # docs with zero mentions on both sides never reach the join output
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    per_doc = (
        all_docs.join(per_doc, "doc_id", "left")
        .fillna(0, subset=["tp", "fp", "fn", "has_gold", "has_pred"])
    )
    scored = per_doc.select(
        "doc_id",
        (F.col("fp") + F.col("fn")).alias("count"),
        F.when(
            (F.col("has_gold") == 1) & (F.col("has_pred") == 1),
            F.when(
                (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
                2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ).otherwise(0.0),
        )
        .otherwise(1.0)
        .alias("fscore"),
    )
    glob = scored.agg(F.max("count").alias("max_count"))
    adj = scored.crossJoin(F.broadcast(glob)).select(
        "doc_id",
        "count",
        (
            F.col("fscore")
            - F.col("count") / F.when(F.col("max_count") > 0, F.col("max_count")).otherwise(1)
        ).alias("raw_score"),
    )
    rng = adj.agg(F.min("raw_score").alias("lo"), F.max("raw_score").alias("hi"))
    return (
        adj.crossJoin(F.broadcast(rng))
        .select(
            "doc_id",
            "count",
            F.round(
                F.when(
                    F.col("hi") > F.col("lo"),
                    (F.col("raw_score") - F.col("lo")) / (F.col("hi") - F.col("lo")),
                ).otherwise(0.0),
                6,
            ).alias("score"),
        )
        .orderBy("score", "count", "doc_id")
    )
