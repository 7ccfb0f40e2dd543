"""Dataset statistics (reference stats module re-expressed as aggregates).

Reference: /root/reference/recon/stats.py — get_ner_stats (:13-50),
get_sorted_type_counts (:53-65), label-distribution JS similarity (:68-99),
get_entity_coverage (:102-145), coverage similarity (:148-190), entropy
(:206-263), detect_outliers (:266-283).

All are expressed over a "long mentions" DataFrame
(doc_id, surface, label) + the documents DataFrame, as single wide
aggregations. Spark performs map-side partial aggregation for every
built-in agg here, so the global roll-ups are two-stage automatically;
``entity_coverage(salted=True)`` additionally pre-aggregates on an
explicit salt for the head-entity-skew case where per-partition distinct
surface counts are low but a few surfaces dominate (the CC-scale "U.S."
problem — see SURVEY.md §4).

Numeric results are rounded to 6 decimals so the DuckDB oracle compares
bit-equal despite summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recon_spark.schema import NOT_LABELED


def ner_stats(docs_with_spans: DataFrame) -> DataFrame:
    """One row: n_examples, n_examples_no_entities, n_annotations."""
    return docs_with_spans.agg(
        F.count(F.lit(1)).alias("n_examples"),
        F.sum((F.size("spans") == 0).cast("long")).alias("n_examples_no_entities"),
        F.sum(F.size("spans")).alias("n_annotations"),
    )


def label_counts(mentions: DataFrame) -> DataFrame:
    """Per-label annotation counts, descending (get_ner_stats's
    n_annotations_per_type)."""
    return (
        mentions.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "label")
    )


def sorted_type_counts(mentions: DataFrame, docs_with_spans: DataFrame) -> DataFrame:
    """Label counts + NOT_LABELED bucket (count of no-entity examples),
    sorted by label name — reference get_sorted_type_counts."""
    no_ent = docs_with_spans.agg(
        F.sum((F.size("spans") == 0).cast("long")).alias("n")
    ).select(F.lit(NOT_LABELED).alias("label"), "n")
    counts = mentions.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return counts.unionByName(no_ent).orderBy("label")


def entity_coverage(
    mentions: DataFrame,
    case_sensitive: bool = False,
    salted: bool = False,
    salt_buckets: int = 16,
) -> DataFrame:
    """(surface, label, count) sorted by count desc — the head-entity-skew
    aggregation. salted=True forces an explicit two-stage aggregate:
    partial on (surface, label, salt) then final on (surface, label), which
    bounds the reduce-side row count per key at CC scale even for
    aggregates without map-side combine."""
    surface = F.col("surface") if case_sensitive else F.lower(F.col("surface"))
    m = mentions.select(surface.alias("surface"), "label", "doc_id")
    if salted:
        partial = m.groupBy(
            "surface", "label", F.pmod(F.col("doc_id"), F.lit(salt_buckets)).alias("__salt")
        ).agg(F.count(F.lit(1)).alias("c"))
        agg = partial.groupBy("surface", "label").agg(F.sum("c").alias("count"))
    else:
        agg = m.groupBy("surface", "label").agg(F.count(F.lit(1)).alias("count"))
    return agg.orderBy(F.desc("count"), "surface", "label")


def _entropy_agg(df: DataFrame, count_col: str) -> DataFrame:
    """Shannon entropy of a count column, single pass:
    H = ln(T) - sum(c*ln c)/T  (== -sum(c/T * ln(c/T)))."""
    c = F.col(count_col).cast("double")
    return df.agg(
        F.round(
            F.log(F.sum(c)) - F.sum(c * F.log(c)) / F.sum(c), 6
        ).alias("entropy")
    )


def label_balance_entropy(mentions: DataFrame) -> DataFrame:
    """Entropy of per-label annotation counts (reference
    calculate_label_balance_entropy, golden 0.57 on skills corpus)."""
    counts = mentions.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    return _entropy_agg(counts, "c")


def entity_coverage_entropy(mentions: DataFrame) -> DataFrame:
    """Entropy of (surface,label) coverage counts (reference golden 5.24)."""
    cov = entity_coverage(mentions)
    return _entropy_agg(cov, "count")


def label_distribution_similarity(
    mentions_x: DataFrame,
    docs_x: DataFrame,
    mentions_y: DataFrame,
    docs_y: DataFrame,
) -> DataFrame:
    """100·(1 − Jensen-Shannon distance) between the two label
    distributions (incl. NOT_LABELED bucket), base-e — the reference's
    calculate_label_distribution_similarity (golden 86.44).

    Divergence from reference noted: labels absent from one side are
    treated as probability 0 via a full outer join (the reference
    implicitly assumes identical label sets)."""
    cx = sorted_type_counts(mentions_x, docs_x).withColumnRenamed("n", "cx")
    cy = sorted_type_counts(mentions_y, docs_y).withColumnRenamed("n", "cy")
    j = (
        cx.join(cy, "label", "full_outer")
        .select(
            F.coalesce("cx", F.lit(0)).cast("double").alias("cx"),
            F.coalesce("cy", F.lit(0)).cast("double").alias("cy"),
        )
    )
    # p_i = cx/Tx, q_i = cy/Ty, m = (p+q)/2
    # JS = 0.5*sum(p*ln(p/m)) + 0.5*sum(q*ln(q/m)); distance = sqrt(JS)
    totals = j.agg(F.sum("cx").alias("tx"), F.sum("cy").alias("ty"))
    jj = j.crossJoin(F.broadcast(totals))
    pcol = F.col("cx") / F.col("tx")
    qcol = F.col("cy") / F.col("ty")
    mcol = (pcol + qcol) / F.lit(2.0)
    term_p = F.when(pcol > 0, pcol * F.log(pcol / mcol)).otherwise(F.lit(0.0))
    term_q = F.when(qcol > 0, qcol * F.log(qcol / mcol)).otherwise(F.lit(0.0))
    return jj.agg(
        F.round(
            100.0 * (1.0 - F.sqrt(0.5 * F.sum(term_p) + 0.5 * F.sum(term_q))), 6
        ).alias("similarity")
    )


def entity_coverage_similarity(
    mentions_x: DataFrame, mentions_y: DataFrame
) -> DataFrame:
    """How well x's (surface,label) coverage covers y's: one row with
    `entity` (% of y's distinct pairs present in x) and `count`
    (count-weighted %) — reference goldens 31.21/36.67."""
    x_cov = entity_coverage(mentions_x).select("surface", "label")
    y_cov = entity_coverage(mentions_y)
    joined = y_cov.join(
        x_cov.withColumn("__in_x", F.lit(1)), ["surface", "label"], "left"
    )
    return joined.agg(
        F.round(
            100.0 * F.sum((F.col("__in_x").isNotNull()).cast("double")) / F.count(F.lit(1)),
            6,
        ).alias("entity"),
        F.round(
            100.0
            * F.sum(F.when(F.col("__in_x").isNotNull(), F.col("count")).otherwise(0))
            / F.sum("count"),
            6,
        ).alias("count_weighted"),
    )


def detect_outliers(
    df: DataFrame, value_col: str, key_col: str = "doc_id"
) -> DataFrame:
    """IQR-fence outliers (reference detect_outliers: floor() on both
    fences, low is `<=`, high is `>`): returns (key, value, side)."""
    q = df.agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
    ).select(
        F.floor(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        F.floor(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        df.crossJoin(F.broadcast(q))
        .where((F.col(value_col) <= F.col("lo")) | (F.col(value_col) > F.col("hi")))
        .select(
            key_col,
            F.col(value_col).alias("value"),
            F.when(F.col(value_col) <= F.col("lo"), F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("side"),
        )
        .orderBy(key_col)
    )
