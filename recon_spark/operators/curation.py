"""Training-corpus curation operators: benchmark decontamination via
n-gram overlap and deterministic weighted source mixing.

Reference context: recon curates NER corpora by hashing examples and
filtering on per-example predicates (recon/dataset.py Dataset.search,
recon/store.py content-addressed dedupe); a web-scale pretraining
pipeline needs the same two moves at corpus level — (1) drop documents
that leak evaluation benchmarks into the training set (the GPT-3
appendix-C n-gram collision method) and (2) resample sources to a
target mixture deterministically, so a re-run (or a resumed run) makes
byte-identical keep/drop decisions.

Scale design (1000 executors, 100 TB corpus):
- n-gram generation is a map-only JVM transform (split + slice +
  array_join inside whole-stage codegen) — no Python, no shuffle.
- the benchmark side is SMALL by construction (eval suites are MBs,
  the corpus is TBs): its distinct n-gram digest set broadcasts, so
  contamination detection is a broadcast semi/inner join against the
  corpus's streamed n-grams — zero shuffle of corpus data; only the
  per-doc hit aggregation shuffles (doc_id, 1) pairs, map-side
  combined. Joining on the fixed-width md5 digest instead of the raw
  n-gram string keeps broadcast + shuffle rows at 32 bytes regardless
  of n.
- source mixing is a stateless per-row Bernoulli keyed by
  md5(doc_id|source) against a per-source hex threshold: shuffle-free,
  engine-reproducible (any SQL engine with md5 makes identical
  decisions), and stable under resume — the same doc always draws the
  same uniform, the defining property recon's content-addressed store
  relies on for idempotent merges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUALITY_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "quality_weights.parquet",
)


def doc_ngrams(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, ngram[, *carry_cols]) for every whitespace-token n-gram of
    every document. Documents shorter than n tokens contribute nothing.
    Map-only JVM plan — explode(transform(sequence)) inside codegen, no
    shuffle. ``carry_cols`` are passed through unchanged (e.g. an
    event-time column a streaming caller needs to keep its watermark)."""
    n = int(n)
    if n < 1:
        raise ValueError("doc_ngrams: n must be >= 1")
    toked = docs.select(
        F.col(id_col).alias("id"),
        F.split(text_col, " ").alias("toks"),
        *[F.col(c) for c in carry_cols],
    )
    grams = (
        f"CASE WHEN size(toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(toks) - {n} + 1), "
        f"i -> array_join(slice(toks, i, {n}), ' ')) END"
    )
    return toked.select(
        "id", F.explode(F.expr(grams)).alias("ngram"), *carry_cols
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: for each corpus document,
    how many of its n-grams (total and distinct) collide with ANY
    n-gram of the benchmark set. Returns only contaminated documents:
    (doc_id, n_hits, n_distinct_hits), ordered by doc_id.

    The GPT-3/PaLM decontamination primitive: a training document that
    shares a long n-gram with an eval benchmark is presumed to leak it.
    The benchmark's distinct n-gram digest set is broadcast (eval
    suites are small relative to any training corpus); corpus n-grams
    stream through the broadcast hash join and only (doc_id) hit pairs
    shuffle for the final count — corpus text never shuffles.
    """
    bench = (
        doc_ngrams(benchmark, n, id_col=id_col, text_col=bench_text_col)
        .select(F.md5("ngram").alias("g"))
        .distinct()
    )
    hits = (
        doc_ngrams(corpus, n, id_col=id_col, text_col=text_col)
        .select("id", F.md5("ngram").alias("g"))
        .join(F.broadcast(bench), "g")
    )
    return (
        hits.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("g").alias("n_distinct_hits"),
        )
        .select(F.col("id").alias("doc_id"), "n_hits", "n_distinct_hits")
        .orderBy("doc_id")
    )


def _rate_threshold_hex(rate: float) -> str:
    """A rate in [0, 1] as an 8-hex-digit cutoff string: keep iff the
    first 8 md5 hex chars of the row key compare lexicographically
    below it. rate=1.0 maps to 'g' (> every hex digit), so it keeps
    everything including the all-f draw."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"source rate out of [0,1]: {rate}")
    if rate >= 1.0:
        return "g"  # lexicographically above any hex string
    return format(int(rate * (1 << 32)), "08x")


def source_mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic weighted source mixing: keep each document with
    per-source probability ``rates[source]`` (``default_rate`` for
    unlisted sources), decided by whether the first 8 hex chars of
    md5(doc_id|source) fall below the source's rate threshold.

    Returns the kept rows (all input columns + ``u_hex`` the draw),
    exactly reproducible across runs, engines, partitionings, and
    resumes — no RNG state, no shuffle; a pure map-side filter that
    composes with whatever scan it sits on (predicate stays in
    whole-stage codegen). This is the corpus analog of recon's
    content-addressed example identity (recon/store.py:39-47): the
    decision is a function of the row, not of execution order —
    re-running a failed partition keeps exactly the same documents.

    A NULL source coalesces to '' on BOTH the key and the rate lookup
    (so such docs draw at default_rate) — without the sentinel,
    concat_ws silently skips the NULL (key degrades to doc_id alone)
    while a SQL oracle's ``||`` yields a NULL md5 and drops the row:
    divergent keep decisions. The oracle twin applies the same
    coalesce.
    """
    src = F.coalesce(F.col(source_col), F.lit(""))
    u = F.substring(
        F.md5(F.concat_ws("|", F.col(id_col).cast("string"), src)),
        1,
        8,
    )
    thr = F.lit(_rate_threshold_hex(default_rate))
    for s, r in sorted(rates.items()):
        thr = F.when(src == s, F.lit(_rate_threshold_hex(r))).otherwise(thr)
    return docs.withColumn("u_hex", u).where(F.col("u_hex") < thr)


def hashed_linear_score(
    docs: DataFrame,
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality scoring plumbing (the CCNet/fastText filter
    stage): score = sigmoid(bias + sum_t w(t)) over the document's
    tokens, with per-token weights drawn deterministically from the
    token's md5 digest — w(t) = hex16(md5(t))/65535 - 0.5 in
    [-0.5, 0.5]. Returns (doc_id, n_terms, score, keep).

    The weights are an honestly-synthetic stand-in for a trained
    model's embedding table (no pretrained weights ship in this
    sandbox); the *plumbing* is the real thing: per-token weight
    lookup, additive pooling, sigmoid, threshold — and it runs as a
    pure map-only JVM fold (aggregate over the token array inside
    whole-stage codegen): zero shuffle, zero Python, composes with the
    scan it sits on. Swapping in trained weights = replacing the hash
    expression with a broadcast map lookup, same plan shape.

    Score is rounded to 6 decimals; the DuckDB oracle reproduces the
    same weights from the same md5 arithmetic (summation-order
    differences are absorbed by the rounding).

    Documents with no non-empty tokens are DROPPED (not scored): a
    zero-token document has no evidence either way and sigmoid(bias)
    would rubber-stamp it keep=true at the default bias — the same rows
    the oracle's unnest+WHERE t<>'' eliminates before GROUP BY, so both
    engines agree on empty/whitespace-only text.
    """
    w = (
        "CAST(conv(substring(md5(t), 1, 4), 16, 10) AS DOUBLE) / 65535.0D - 0.5D"
    )
    fold = (
        f"aggregate(filter(split({text_col}, ' '), t -> t <> ''), "
        f"0.0D, (acc, t) -> acc + ({w}))"
    )
    raw = F.lit(float(bias)) + F.expr(fold)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6)
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.expr(f"filter(split({text_col}, ' '), t -> t <> '')")).alias(
                "n_terms"
            ),
            score.alias("score"),
            (score >= threshold).alias("keep"),
        )
        .where(F.col("n_terms") > 0)
        .orderBy("doc_id")
    )


def load_quality_weights(spark: SparkSession, path: str | None = None) -> DataFrame:
    """The trained quality-filter weights table
    (scripts/train_quality_weights.py): (term, weight, weight_micro),
    plus a '__bias__' pseudo-term row. Dimension-table sized (vocab
    rows); on a real cluster this lives on shared storage next to the
    model registry — here it ships inside the package."""
    return spark.read.parquet(path or QUALITY_WEIGHTS_PATH)


def trained_quality_score(
    docs: DataFrame,
    weights: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality filter with TRAINED weights — the broadcast
    variant hashed_linear_score's docstring promises: per-token weight
    lookup against a real (toy-trained, deterministic) fastText-style
    table, additive pooling, sigmoid, threshold. Returns
    (doc_id, n_terms, score, keep); zero-token docs are dropped
    (hashed_linear_score semantics).

    Scale shape: tokens explode map-side and BROADCAST-hash-join the
    weights table (vocab rows — a dimension table even for a 2M-bucket
    fastText model at ~32 MB), so corpus text never shuffles; the only
    exchange is the (doc_id, micro) pair aggregation, 16-byte rows with
    full map-side combine. No Python anywhere.

    Exactness: the sum accumulates integer micro-weights
    (weight_micro = round(w * 1e6)), so the fold is order-independent
    and bit-equal across engines; floats appear only in the final
    sigmoid, rounded to 6. OOV tokens weigh 0 (left join + coalesce),
    the standard linear-model convention.
    """
    bias_micro = (
        weights.where(F.col("term") == "__bias__")
        .select("weight_micro")
        .head()
    )
    bias_micro = int(bias_micro[0]) if bias_micro is not None else 0
    w = weights.where(F.col("term") != "__bias__").select("term", "weight_micro")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(f"filter(split({text_col}, ' '), t -> t <> '')")).alias(
            "term"
        ),
    )
    agg = (
        toks.join(F.broadcast(w), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.coalesce("weight_micro", F.lit(0))).alias("sum_micro"),
        )
    )
    raw = (F.lit(bias_micro) + F.col("sum_micro")) / F.lit(1_000_000.0)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-raw)), 6)
    return agg.select(
        "doc_id",
        "n_terms",
        score.alias("score"),
        (score >= threshold).alias("keep"),
    ).orderBy("doc_id")


def dsir_grams(
    docs: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, bucket) for every unigram+bigram occurrence of
    every document, hashed into `n_buckets` buckets (the DSIR feature
    space — Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling", which scores docs by hashed-n-gram
    importance weights). Map-only JVM plan: split + transform +
    explode + md5 inside codegen; no Python, no shuffle. The md5
    bucket (first 15 hex chars mod B) is the same cross-engine-exact
    idiom the production dedup hash uses (dedupe.py tcode)."""
    b = int(n_buckets)
    if b < 2:
        raise ValueError("dsir_grams: n_buckets must be >= 2")
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.expr(f"filter(split({text_col}, ' '), t -> t <> '')").alias("toks"),
    )
    grams = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "concat(toks, CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
                "ELSE array() END)"
            )
        ).alias("g"),
    )
    return grams.select(
        "doc_id",
        "source",
        (
            F.expr("CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)") % b
        ).alias("bucket"),
    )


def dsir_bucket_weights(
    grams: DataFrame, target_sources: list[str], n_buckets: int
) -> DataFrame:
    """Per-bucket DSIR importance weight: w(b) = ln(p_target(b) /
    q_raw(b)) with add-0.5 Laplace smoothing, quantized to integer
    micro-nats (round(w * 1e6)) so downstream per-document sums are
    order-independent integer folds — bit-equal across engines and
    partitionings, the same exactness trick trained_quality_score uses.

    Returns (bucket, w_micro), one row per bucket observed in the
    corpus (<= n_buckets rows — a broadcast dimension by construction).

    Scale shape: two aggregations over short (bucket) keys with full
    map-side combine — the shuffle carries at most n_buckets rows per
    map partition regardless of corpus size; totals are a 1-row frame
    cross-joined (broadcast) back in. At 10^12 docs the target side is
    typically a curated sample, so its pass is cheap; the raw pass is
    one map-only scan + a B-row agg.

    Float caveat (documented, not hidden): ln() is evaluated on the
    same double ratio in both engines; the micro quantization makes a
    cross-libm 1-ulp difference visible only if the true value sits
    within ~1e-16 of a 0.5e-6 rounding boundary — measure-zero in
    practice and pinned by the oracle-parity tests."""
    b = int(n_buckets)
    raw = grams.groupBy("bucket").agg(F.count(F.lit(1)).alias("q_cnt"))
    tgt = (
        grams.where(F.col("source").isin(*target_sources))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("p_cnt"))
    )
    totals = grams.agg(
        F.count(F.lit(1)).alias("q_tot"),
        F.sum(
            F.when(F.col("source").isin(*target_sources), 1).otherwise(0)
        ).alias("p_tot"),
    )
    joined = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce("p_cnt", F.lit(0)) + 0.5)
                        / (F.col("p_tot") + 0.5 * b)
                    )
                    / ((F.col("q_cnt") + 0.5) / (F.col("q_tot") + 0.5 * b))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("w_micro"),
        )
    )
    return joined


def dsir_resample(
    docs: DataFrame,
    target_sources: list[str],
    k: int = 100,
    n_buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR importance resampling: score every document by the sum of
    its hashed-n-gram bucket importance weights (micro-nat integers),
    keep the top k. Returns (doc_id, source, n_grams, dsir_score)
    ordered by (dsir_score DESC, doc_id).

    n_buckets defaults to 8192 (the paper-scale hashed feature space —
    Xie et al. use 10^4; bucket count changes neither the plan shape
    nor the hashing cost, only the broadcast dimension's row count).
    The driver query pins n_buckets=64 explicitly so its DuckDB oracle
    stays readable.

    Plan: the corpus is scanned twice (weights pass, scoring pass) —
    both map-only explodes feeding combinable aggs; the exploded gram
    frame is deliberately NOT materialized (it is ~2x token count —
    recomputing a codegen'd split/explode is far cheaper at 10^12 docs
    than shuffling or caching it). The <= n_buckets weight rows
    broadcast back onto the scoring pass, so corpus text never
    shuffles; the only wide exchange is the (doc_id, micro) pair agg,
    map-side combined. Top-k compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows), never a global
    sort. Deterministic end-to-end: same corpus -> same kept set on
    any cluster size, the resume-stability property source_mix_sample
    establishes for rate sampling."""
    grams = dsir_grams(docs, n_buckets, id_col, text_col, source_col)
    weights = dsir_bucket_weights(grams, target_sources, n_buckets)
    scored = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w_micro").alias("sum_micro"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.round(F.col("sum_micro") / 1_000_000.0, 6).alias("dsir_score"),
        )
    )
    return scored.orderBy(F.desc("dsir_score"), F.asc("doc_id")).limit(int(k))
