"""Recognizer evaluation: per-label precision/recall/F1.

Reference: EntityRecognizer.evaluate (/root/reference/recon/recognizer.py:
45-81, 140-158) — spaCy PRF scoring of predicted vs gold span sets.
Semantics: a span counts as tp for label L iff (start, end, label) match
exactly; a matched-position wrong-label pair is fp for the predicted
label and fn for the gold label. This doubles as the triple P/R >= 0.95
harness shape (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recon_spark.operators.insights import _span_keys


def evaluate_recognizer(
    gold: DataFrame,
    pred: DataFrame,
    id_col: str = "doc_id",
    gold_spans: str = "spans",
    pred_spans: str = "pred_spans",
) -> DataFrame:
    """(label, tp, fp, fn, precision, recall, f1) per label plus an
    __ALL__ micro-average row; PRF rounded to 6 decimals."""
    g = _span_keys(gold, id_col, gold_spans).withColumnRenamed("label", "gold_label")
    p = (
        _span_keys(pred, id_col, pred_spans)
        .withColumnRenamed("label", "pred_label")
        .withColumnRenamed("text", "pred_text")
    )
    j = g.join(p, ["doc_id", "start", "end"], "full_outer")

    tp = (
        j.where(F.col("gold_label") == F.col("pred_label"))
        .groupBy(F.col("gold_label").alias("label"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    fp = (
        j.where(
            F.col("pred_label").isNotNull()
            & (F.col("gold_label").isNull() | (F.col("gold_label") != F.col("pred_label")))
        )
        .groupBy(F.col("pred_label").alias("label"))
        .agg(F.count(F.lit(1)).alias("fp"))
    )
    fn = (
        j.where(
            F.col("gold_label").isNotNull()
            & (F.col("pred_label").isNull() | (F.col("gold_label") != F.col("pred_label")))
        )
        .groupBy(F.col("gold_label").alias("label"))
        .agg(F.count(F.lit(1)).alias("fn"))
    )
    per_label = (
        tp.join(fp, "label", "full_outer")
        .join(fn, "label", "full_outer")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    overall = per_label.agg(
        F.lit("__ALL__").alias("label"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    )
    both = per_label.unionByName(overall)
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    ).otherwise(0.0)
    return both.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("label")
