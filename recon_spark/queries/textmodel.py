"""Statistical text-model query registry: n-gram LM perplexity
filtering (CCNet-style) and BPE subword-vocabulary training.

Training split convention: sources src0..src9 are the "clean reference
corpus" (the Wikipedia stand-in), src10..src19 the raw crawl side —
a deterministic split so the model, the scores, and the gate are all
oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recon_spark.operators.lm import (
    PPL_ROUND,
    score_perplexity,
    sql_bigram_lm_ctes,
    train_bigram_lm,
)

TRAIN_SOURCE_RE = "^src[0-9]$"
_SQL_TRAIN_WHERE = "regexp_matches(source, '^src[0-9]$')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stupid-backoff bigram perplexity, model trained on
    the clean-source half, scored over the full corpus."""
    docs = _docs(spark, sf_dir)
    model = train_bigram_lm(docs.where(F.col("source").rlike(TRAIN_SOURCE_RE)))
    return score_perplexity(docs, model)


SQL_LM_PERPLEXITY = f"""
WITH {sql_bigram_lm_ctes(_SQL_TRAIN_WHERE)}
SELECT doc_id, n_bigrams, ppl FROM ppl
"""


def q_lm_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/tail gate as a per-source report: keep = ppl at or
    below the global exact median (the 'head' half). Output (source,
    n_docs, n_keep, avg_ppl)."""
    docs = _docs(spark, sf_dir)
    model = train_bigram_lm(docs.where(F.col("source").rlike(TRAIN_SOURCE_RE)))
    ppl = score_perplexity(docs, model)
    thr = ppl.agg(F.expr("percentile(ppl, 0.5)").alias("thr"))
    return (
        docs.select("doc_id", "source")
        .join(ppl, "doc_id")
        .join(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("ppl") <= F.col("thr"), 1).otherwise(0)
            ).alias("n_keep"),
            F.round(F.avg("ppl"), PPL_ROUND).alias("avg_ppl"),
        )
    )


SQL_LM_QUALITY_GATE = f"""
WITH {sql_bigram_lm_ctes(_SQL_TRAIN_WHERE)},
thr AS (SELECT quantile_cont(ppl, 0.5) AS thr FROM ppl)
SELECT d.source, count(*) AS n_docs,
       sum(CASE WHEN p.ppl <= thr.thr THEN 1 ELSE 0 END) AS n_keep,
       round(avg(p.ppl), {PPL_ROUND}) AS avg_ppl
FROM documents d
JOIN ppl p ON d.doc_id = p.doc_id
CROSS JOIN thr
GROUP BY 1
"""


QUERIES = {
    "lm_perplexity": q_lm_perplexity,
    "lm_quality_gate": q_lm_quality_gate,
}

ORACLES = {
    "lm_perplexity": SQL_LM_PERPLEXITY,
    "lm_quality_gate": SQL_LM_QUALITY_GATE,
}
