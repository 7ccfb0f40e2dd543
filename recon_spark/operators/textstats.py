"""Text analysis operators: token counts, quality scoring, language-ID
heuristic, document fingerprinting.

All pure JVM expressions (split/size/aggregate) — the per-document text
analytics a training-data pipeline runs at ingest. The fingerprint is a
polynomial rolling hash over word codes, reproducible in ANSI SQL (the
DuckDB oracle uses list_reduce with the same constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recon_spark.gazetteer import STOPWORDS
from recon_spark.operators.dedupe import P, _wcodes_expr

_STOP_ARR = "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


def text_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars_text, avg_token_len, stopword_ratio,
    quality_score). quality = min(1, n_tokens/100) * (1 - stopword_ratio):
    favors long documents with low stopword density — the shape of the
    reference-era quality heuristics, fully deterministic."""
    toks = f"split({text_col}, ' ')"
    n_tokens = f"size({toks})"
    n_stop = f"size(filter({toks}, w -> array_contains({_STOP_ARR}, w)))"
    return df.select(
        F.col(id_col),
        F.expr(n_tokens).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars_text"),
        F.round(
            F.expr(
                f"aggregate({toks}, 0L, (a, w) -> a + length(w)) / CAST({n_tokens} AS DOUBLE)"
            ),
            6,
        ).alias("avg_token_len"),
        F.round(F.expr(f"{n_stop} / CAST({n_tokens} AS DOUBLE)"), 6).alias(
            "stopword_ratio"
        ),
        F.round(
            F.expr(
                f"least(1.0D, {n_tokens} / 100.0D) * (1.0D - {n_stop} / CAST({n_tokens} AS DOUBLE))"
            ),
            6,
        ).alias("quality_score"),
    ).orderBy(id_col)


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint): polynomial rolling hash over word codes,
    h = fold(h*31 + wcode) mod P — an order-sensitive content fingerprint
    (re-ordered near-dups get different prints; use dedupe.minhash for
    order-insensitive)."""
    wc = _wcodes_expr(text_col)
    return df.select(
        F.col(id_col),
        F.expr(f"aggregate({wc}, 0L, (a, c) -> (a * 31 + c) % {P})").alias("fingerprint"),
    ).orderBy(id_col)


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID via stopword evidence: 'en' when English
    stopword density >= 1%, else 'und'. (A real pipeline swaps in a
    fastText-style model behind the same column contract; on the
    synthetic corpus every language shares the vocabulary, so this is
    plumbing + determinism, exercised in tests on the pages corpus.)"""
    toks = f"split({text_col}, ' ')"
    ratio = f"size(filter({toks}, w -> array_contains({_STOP_ARR}, w))) / CAST(size({toks}) AS DOUBLE)"
    return df.withColumn(
        out_col, F.expr(f"CASE WHEN {ratio} >= 0.01 THEN 'en' ELSE 'und' END")
    )


def lang_mention_stats(docs: DataFrame, mentions: DataFrame) -> DataFrame:
    """Per-language corpus profile: docs, chars, mentions, mentions/doc."""
    d = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    m = (
        mentions.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )
    return (
        d.join(m, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "total_chars",
            F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
            F.round(
                F.coalesce("n_mentions", F.lit(0)) / F.col("n_docs").cast("double"), 6
            ).alias("mentions_per_doc"),
        )
        .orderBy("lang")
    )


# simplified GPT-2-style pre-tokenizer: contractions, letter runs, digit
# runs, punctuation runs, whitespace runs. Plain alternation only (no
# lookarounds) so Java regex (Spark) and RE2 (DuckDB) match identically.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n]+|[ \t\n]+"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens): whitespace token count vs
    BPE-ish pre-tokenizer count (non-whitespace matches of BPE_PATTERN).
    Pure JVM regexp; zero shuffle."""
    ws = f"size(split({text_col}, ' '))"
    bpe = (
        f"size(filter(regexp_extract_all({text_col}, \"{BPE_PATTERN}\", 0),"
        " t -> NOT (t rlike '^[ \\\\t\\\\n]+$')))"
    )
    return df.select(
        F.col(id_col),
        F.expr(ws).alias("n_ws_tokens"),
        F.expr(bpe).alias("n_bpe_tokens"),
    )


# Char-trigram profiles per language (classic Cavnar-Trenkle shape):
# the most characteristic function-word trigrams, embedded so Spark and
# the DuckDB oracle score identically. Ordered dict -> deterministic
# tie-break (first language wins ties after the score comparison).
NGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of "),
    "es": (" el", "el ", " qu", "que", "ue ", " lo", "los", " es"),
    "fr": (" le", "le ", " et", "et ", " la", " je", " ne", "ais"),
    "de": ("der", " de", "die", "ie ", " un", "und", "sch", "ein"),
}


def _langid_ngram_expr(text_col: str, min_hits: int, dialect: str) -> str:
    """ONE generator for the n-gram language-ID expression, emitted in
    either engine dialect — the scoring, tie-break, and threshold logic
    exists exactly once, so Spark and the DuckDB oracle can never
    silently diverge. Each language score is computed once into a
    struct local (bound via a 1-element array + lambda), then the CASE
    argmax branches over the struct fields instead of re-embedding (and
    re-scanning) the text per comparison."""

    def count_sql(tri: str) -> str:
        esc = tri.replace("'", "''")
        return f"((length({text_col}) - length(replace({text_col}, '{esc}', ''))) / 3)"

    langs = list(NGRAM_PROFILES)
    scores = {
        lang: "(" + " + ".join(count_sql(t) for t in NGRAM_PROFILES[lang]) + ")"
        for lang in langs
    }
    if dialect == "spark":
        struct = "named_struct(" + ", ".join(
            f"'{lang}', {scores[lang]}" for lang in langs
        ) + ")"
        wrap, idx = "transform(array({s}), s -> {body})", "[0]"
    elif dialect == "duckdb":
        struct = "struct_pack(" + ", ".join(
            f"{lang} := {scores[lang]}" for lang in langs
        ) + ")"
        wrap, idx = "list_transform([{s}], s -> {body})", "[1]"
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    branches = []
    for i, lang in enumerate(langs):
        conds = []
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"s.{lang} {op} s.{other}")
        conds.append(f"s.{lang} >= {min_hits}")
        branches.append("WHEN " + " AND ".join(conds) + f" THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return wrap.format(s=struct, body=case) + idx


def sql_language_id_ngram(text_col: str = "text", min_hits: int = 2) -> str:
    """DuckDB replica of language_id_ngram — same generator, duckdb
    dialect."""
    return _langid_ngram_expr(text_col, min_hits, "duckdb")


def language_id_ngram(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred", min_hits: int = 2
) -> DataFrame:
    """n-gram language ID: score each language by total occurrences of
    its profile trigrams (substring counting via length difference —
    pure JVM, zero shuffle, no regex), predict the argmax with a fixed
    profile-order tie-break, 'und' below ``min_hits``."""
    return df.withColumn(out_col, F.expr(_langid_ngram_expr(text_col, min_hits, "spark")))


# --------------------------------------------------------------------------
# Gopher-style repetition metrics
# --------------------------------------------------------------------------

def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition quality signals (the Gopher/MassiveText
    repetition-filter family, re-specified for whitespace tokens):

      n_tokens             whitespace token count
      dup_word_frac        fraction of token OCCURRENCES whose token
                           appears more than once in the document
      dup_bigram_char_frac min(1, chars covered by occurrences of
                           duplicated word-bigrams / total chars)
      top_bigram           most frequent word-bigram (ties: smallest)
      top_bigram_char_frac chars covered by the top bigram / total chars

    Distributed shape: explode -> groupBy(doc, gram) with map-side
    partial aggregation. The shuffle key is (doc_id, gram) — balanced by
    construction (no head key can exceed one document's token count), so
    this holds at 100x without salting. Pure JVM end to end.
    """
    base = df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.split(text_col, " ").alias("ws"),
    )
    words = base.select(id_col, F.size("ws").alias("n_tokens"), F.explode("ws").alias("w"))
    wc = words.groupBy(id_col, "n_tokens", "w").agg(F.count(F.lit(1)).alias("cnt"))
    wstats = wc.groupBy(id_col, "n_tokens").agg(
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("dup_word_frac")
    )
    bigrams_expr = (
        "CASE WHEN size(ws) >= 2 THEN transform(sequence(1, size(ws) - 1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    bg = base.select(
        id_col, "n_chars", F.explode(F.expr(bigrams_expr)).alias("bg")
    )
    bc = bg.groupBy(id_col, "n_chars", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    br = bc.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.desc("cnt"), "bg")
        ),
    )
    bstats = br.groupBy(id_col, "n_chars").agg(
        F.round(
            F.least(
                F.lit(1.0),
                F.sum(
                    F.when(F.col("cnt") > 1, F.col("cnt") * F.length("bg")).otherwise(
                        F.lit(0)
                    )
                )
                / F.col("n_chars").cast("double"),
            ),
            6,
        ).alias("dup_bigram_char_frac"),
        F.max(F.when(F.col("rn") == 1, F.col("bg"))).alias("top_bigram"),
        F.max(
            F.when(
                F.col("rn") == 1,
                F.round(F.col("cnt") * F.length("bg") / F.col("n_chars").cast("double"), 6),
            )
        ).alias("top_bigram_char_frac"),
    )
    return (
        wstats.join(bstats.drop("n_chars"), id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_word_frac",
            F.coalesce("dup_bigram_char_frac", F.lit(0.0)).alias("dup_bigram_char_frac"),
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_char_frac", F.lit(0.0)).alias("top_bigram_char_frac"),
        )
        .orderBy(id_col)
    )


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns constrained to the Java-regex / RE2 common subset (no
# lookarounds, no backrefs) so Spark and the DuckDB oracle match the
# same spans. \b is an ASCII word boundary in both engines.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4-style PII scrub: count and mask emails, IPv4 addresses and
    NNN-NNN-NNNN phone numbers. Counts are measured on the ORIGINAL
    text; masking applies email -> ip -> phone in that order (an email
    span is never re-scanned as a phone). Pure JVM regexp — zero
    shuffle, survives any scale-up as a map-only stage."""
    t = F.col(text_col)
    red = F.regexp_replace(t, F.lit(PII_EMAIL), F.lit("<EMAIL>"))
    red = F.regexp_replace(red, F.lit(PII_IPV4), F.lit("<IP>"))
    red = F.regexp_replace(red, F.lit(PII_PHONE), F.lit("<PHONE>"))
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
        red.alias("redacted"),
    )


# --------------------------------------------------------------------------
# TF-IDF keyword extraction
# --------------------------------------------------------------------------

def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf:
    score = tf(term, doc) * ln(N / df(term)), rounded to 6 decimals,
    ranked per doc by (score DESC, term ASC).

    Distributed shape: one explode -> (doc, term) count (balanced
    composite key, map-side combine), document frequency as a second
    short-key aggregation of that same frame (no re-read of the
    corpus), a term-keyed join to attach idf, and a per-doc window
    top-k. N is a single scalar action. The term-df frame is |vocab|
    rows — at web scale still far smaller than the corpus, and AQE
    broadcasts it when it fits."""
    n_docs = df.count()  # scalar
    terms = df.select(id_col, F.explode(F.split(text_col, " ")).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                6,
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("score"), "term")
            ),
        )
    )
    return (
        scored.where(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
        .orderBy(id_col, "rank")
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Global boilerplate n-gram detection (RefinedWeb/CCNet-style line
    dedup generalized to token windows, since web boilerplate repeats
    verbatim across pages): every whitespace ``n``-gram with document
    frequency >= ``min_df``, returned as (ngram, df, total) where df
    counts documents containing it and total counts occurrences.

    Scale design (100 TB):
    - n-gram generation is per-row JVM (``transform`` over the token
      array) — no Python, no shuffle.
    - shuffle #1 groups (doc_id, ngram): rows of one document live in
      one input partition, so hash partial aggregation collapses
      within-document repeats map-side before the exchange.
    - shuffle #2 groups ngram for (df, total) — both aggregates are
      commutative counts/sums with full map-side combine, so the
      boilerplate head (the point of the query) collapses early
      exactly like the salted entity-coverage path.
    - at extreme scale, hash n-grams to int64 for the exchanges and
      join the surviving (tiny, min_df-filtered) hash set back to
      recover strings; kept in string form here because the df filter
      already bounds the output and the oracle compares strings.
    """
    w = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"""
        CASE WHEN size(split({text_col}, ' ')) >= {n}
        THEN transform(
          sequence(1, size(split({text_col}, ' ')) - {n - 1}),
          i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))
        ELSE array() END
        """
    )
    per_doc = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("ngram"))
        .groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("cnt").alias("total"),
        )
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.desc("total"), "ngram")
    )


def length_quantiles(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    approx: bool = False,
) -> DataFrame:
    """Per-group length-distribution profile: exact (oracle-checkable)
    or sketch-based quantiles of ``value_col``.

    The corpus-curation use: per-language length cutoffs for the
    cleaning rules (a C4/Gopher-style pipeline derives its thresholds
    from these distributions, not constants).

    Scale design: ``approx=False`` uses ``percentile`` — exact, but it
    buffers each group's values (sort-based) and is the ORACLE TWIN
    only. At 100 TB run ``approx=True``: ``percentile_approx`` is a
    mergeable KLL-style sketch with bounded memory per partition and
    full map-side combine; tests assert the sketch lands within
    tolerance of exact on the test corpus.
    """
    plist = "array(" + ", ".join(repr(p) for p in probs) + ")"
    fn = "approx_percentile" if approx else "percentile"
    acc = ", 10000" if approx else ""
    q = F.expr(f"{fn}({value_col}, {plist}{acc})")
    out = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"), q.alias("qs")
    )
    cols = [
        F.round(F.col("qs").getItem(i), 6).alias(f"p{int(p * 100)}")
        for i, p in enumerate(probs)
    ]
    return out.select("grp", "n_docs", *cols).orderBy("grp")


def source_quality(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    nchars_col: str = "n_chars",
    lang_col: str = "lang",
    short_chars: int = 200,
) -> DataFrame:
    """Per-source (per-domain at crawl scale) quality profile: document
    count, mean length, short-document fraction, language diversity,
    mean type-token ratio. The curation decision layer: a source whose
    short_frac or repetition profile is an outlier gets down-weighted
    or dropped wholesale — the same fence logic as detect_outliers
    (recon/stats.py:266-283) applied one level up the hierarchy.

    Scale design: ONE shuffle on the source key with full map-side
    combine (count/sum/approx-distinct are all mergeable); the
    type-token ratio is computed per row in JVM (array_distinct over
    the token split) before the aggregate, so no second pass. Language
    diversity intentionally uses exact count(distinct) over a low-card
    column here; at crawl scale swap approx_count_distinct — same
    plan shape, sketch merge instead of expand.
    """
    ttr = (
        F.size(F.array_distinct(F.split(F.col(text_col), " ")))
        / F.size(F.split(F.col(text_col), " "))
    )
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(nchars_col), 6).alias("avg_chars"),
            F.round(
                F.avg((F.col(nchars_col) < short_chars).cast("double")), 6
            ).alias("short_frac"),
            F.countDistinct(lang_col).alias("n_langs"),
            F.round(F.avg(ttr), 6).alias("avg_ttr"),
        )
        .orderBy("source")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window chunking: split each document into token chunks
    of ``chunk_size`` with a sliding ``stride`` (overlap = chunk_size -
    stride) — the packing step between a curated corpus and a training
    run. Chunk i covers tokens [i*stride, i*stride + chunk_size); the
    last chunk starts at index ceil(max(n - chunk_size, 0) / stride) so
    every token is covered and a short document yields exactly one
    chunk.

    Pure JVM map-only plan: whitespace tokenize, explode a
    sequence of chunk ids, slice — no shuffle, no Python, pipelines
    into whatever shuffle follows. Returns (id, chunk_id, start_tok,
    n_toks, chunk_md5) — md5 pins the chunk bytes without shipping
    them.
    """
    c, s = int(chunk_size), int(stride)
    if not (0 < s <= c):
        raise ValueError("chunk_documents: need 0 < stride <= chunk_size")
    toked = docs.select(
        F.col(id_col).alias("id"), F.split(text_col, " ").alias("toks")
    )
    return (
        toked.select(
            "id",
            "toks",
            F.posexplode(
                F.expr(
                    f"sequence(0, (greatest(size(toks) - {c}, 0) + {s} - 1) div {s})"
                )
            ).alias("_p", "chunk_id"),
        )
        .select(
            "id",
            "chunk_id",
            (F.col("chunk_id") * s).alias("start_tok"),
            F.expr(f"slice(toks, chunk_id * {s} + 1, {c})").alias("piece"),
        )
        .select(
            "id",
            "chunk_id",
            "start_tok",
            F.size("piece").alias("n_toks"),
            F.md5(F.array_join("piece", " ")).alias("chunk_md5"),
        )
        .orderBy("id", "chunk_id")
    )


def term_spectrum(
    docs: DataFrame,
    max_freq: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequency-of-frequencies spectrum of the corpus vocabulary: for
    each term frequency f (1..max_freq, then one 'max_freq+' bucket),
    how many distinct terms occur exactly f times (hapax legomena at
    f=1), plus that bucket's share of total token mass. The input
    Good-Turing smoothing and vocabulary-pruning decisions read.

    Scale shape: two aggregations, both map-side combinable — tokens
    shuffle once on the term (head terms collapse in partial
    aggregates), then per-term counts shuffle once on the tiny
    frequency-bucket key. No window, no join, no Python.
    """
    terms = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).where(F.col("term") != "")
    per_term = terms.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    bucket = F.when(F.col("f") >= max_freq + 1, F.lit(f"{max_freq + 1}+")).otherwise(
        F.col("f").cast("string")
    )
    ordkey = F.least(F.col("f"), F.lit(max_freq + 1))
    return (
        per_term.select(bucket.alias("freq"), ordkey.alias("ord"), "f")
        .groupBy("freq", "ord")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("f").alias("n_tokens"),
        )
        .orderBy("ord")
        .select("freq", "n_terms", "n_tokens")
    )


# Gopher stopword rule (Rae et al. 2021, appendix A): the paper's gate
# requires >= 2 of exactly these eight English words. Overridable via the
# gopher_quality_filter ``stopwords`` parameter.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Line-start markers treated as bullets for the bullet-line rule.
GOPHER_BULLETS = ("•", "- ", "* ", "· ")


def gopher_quality_filter(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    min_stopwords: int = 2,
    min_alpha_frac: float = 0.8,
    max_symbol_word_ratio: float | None = 0.1,
    max_bullet_line_frac: float | None = 0.9,
    max_ellipsis_line_frac: float | None = 0.3,
    max_dup_line_frac: float | None = 0.3,
    stopwords=GOPHER_STOPWORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher composite quality GATE (Rae et al. 2021 appendix A): the
    production filter stage that text_metrics only measures. Every rule
    failure is named in a deterministic ``reasons`` string (fixed rule
    order, comma-joined, '' = keep) — the audit trail a curation
    pipeline needs to answer "why did this document drop", and the
    thing a bare boolean filter loses. Returns (doc_id, n_words,
    mean_word_len, n_stopwords, n_lines, keep, reasons).

    Defaults are the paper's appendix-A thresholds:
    - word count in [50, 100000]; mean word length in [3, 10]
    - >= 2 of the paper's eight stopwords present (``stopwords`` is a
      parameter — swap in a corpus-specific list without forking)
    - >= 80% of words contain an alphabetic character
    - symbol-to-word ratio <= 0.1 for '#' and '...' combined
    - <= 90% of lines start with a bullet marker; <= 30% end with an
      ellipsis
    - duplicate-line fraction <= 30% (the paper's repetition family;
      per-doc lines are bounded, so 1 - distinct/total via
      array_distinct is map-only — the cross-doc explode + groupBy in
      repetition_metrics exists for the word/bigram grams whose per-doc
      arrays are NOT small, and is deliberately not reused here)

    Any of the four line/symbol thresholds set to None disables that
    rule (legacy word-level-only gate). Thresholds are corpus-tunable
    parameters; the driver queries pin values that exercise every rule
    on the test corpus.

    Scale shape: map-only pure JVM, zero shuffle, zero Python — and
    deliberately built from NON-LAMBDA expressions (regexp counts,
    replace-length arithmetic, array_contains sums, array_remove /
    array_distinct): Spark executes higher-order-function lambdas
    interpreted, outside whole-stage codegen, which measured ~1.6-2x
    slower for this gate at 5M rows (same lesson as the PSL matcher
    rewrite — see BENCH/BASELINE.md). Division guards keep empty texts
    well-defined under ANSI mode (they fail the word-count floor)."""
    import re as _re

    text = F.col(text_col)
    # tokens = maximal non-space runs (identical to the previous
    # filter(split(text,' '), t -> t <> '') semantics: '\n' and '\t'
    # are NOT token separators, matching the whitespace-token spec)
    n_words = F.size(F.regexp_extract_all(text, F.lit("[^ ]+"), F.lit(0)))
    # sum of token lengths == count of non-space characters
    sum_len_c = F.length(F.regexp_replace(text, " ", "")).cast("long")
    # distinct stopwords present: one codegen'd array_contains per word
    # (raw split is fine — '' can never equal a stopword)
    toks_raw = F.split(text, " ")
    n_stop_c = sum(
        (F.array_contains(toks_raw, s).cast("int") for s in stopwords),
        F.lit(0),
    )
    n_alpha = F.size(
        F.regexp_extract_all(text, F.lit("[^ ]*[A-Za-z][^ ]*"), F.lit(0))
    )
    n_ell = (
        F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    n_hash = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    # lines: space-trim each line in one multiline regexp pass, then
    # split + array_remove('') drops blank lines (the previous
    # transform(trim)/filter lambda pair, lambda-free)
    trimmed = F.regexp_replace(text, "(?m)^ +| +$", "")
    lines = F.array_remove(F.split(trimmed, "\n"), "")
    bullet_re = "(?m)^(?:" + "|".join(_re.escape(b) for b in GOPHER_BULLETS) + ")"
    n_bullets = F.size(F.regexp_extract_all(trimmed, F.lit(bullet_re), F.lit(0)))
    n_ellipsis_l = F.size(
        F.regexp_extract_all(trimmed, F.lit(r"(?m)(?:\.\.\.|…)$"), F.lit(0))
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        sum_len_c.alias("sum_len"),
        n_stop_c.alias("n_stopwords"),
        n_alpha.alias("n_alpha"),
        (n_hash + n_ell).alias("n_symbols"),
        F.size(lines).alias("n_lines"),
        n_bullets.alias("n_bullet_lines"),
        n_ellipsis_l.alias("n_ellipsis_lines"),
        (F.size(lines) - F.size(F.array_distinct(lines))).alias("n_dup_lines"),
    )
    mean_wl = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        F.col("sum_len") / F.col("n_words")
    )
    alpha_frac = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        F.col("n_alpha") / F.col("n_words")
    )
    symbol_ratio = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        F.col("n_symbols") / F.col("n_words")
    )

    def line_frac(col: str):
        return F.when(F.col("n_lines") == 0, F.lit(0.0)).otherwise(
            F.col(col) / F.col("n_lines")
        )

    rules = [
        F.when(F.col("n_words") < min_words, F.lit("words_low")),
        F.when(F.col("n_words") > max_words, F.lit("words_high")),
        F.when(mean_wl < min_word_len, F.lit("word_len_low")),
        F.when(mean_wl > max_word_len, F.lit("word_len_high")),
        F.when(F.col("n_stopwords") < min_stopwords, F.lit("stopwords")),
        F.when(alpha_frac < min_alpha_frac, F.lit("alpha_frac")),
    ]
    if max_symbol_word_ratio is not None:
        rules.append(
            F.when(symbol_ratio > max_symbol_word_ratio, F.lit("symbol_ratio"))
        )
    if max_bullet_line_frac is not None:
        rules.append(
            F.when(
                line_frac("n_bullet_lines") > max_bullet_line_frac,
                F.lit("bullet_lines"),
            )
        )
    if max_ellipsis_line_frac is not None:
        rules.append(
            F.when(
                line_frac("n_ellipsis_lines") > max_ellipsis_line_frac,
                F.lit("ellipsis_lines"),
            )
        )
    if max_dup_line_frac is not None:
        rules.append(
            F.when(
                line_frac("n_dup_lines") > max_dup_line_frac, F.lit("dup_lines")
            )
        )
    # concat_ws skips NULL args, so the fired-rule names join directly
    # (the last lambda — filter(array(...), isNotNull) — removed)
    reasons = F.concat_ws(",", *rules)
    return d.select(
        "doc_id",
        "n_words",
        F.round(mean_wl, 6).alias("mean_word_len"),
        "n_stopwords",
        "n_lines",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    ).orderBy("doc_id")


def pack_sequences(
    docs: DataFrame,
    capacity: int = 128,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing — the inverse of chunk_documents: concatenate
    SHORT documents into fixed-``capacity`` training sequences (the
    step every LLM pipeline runs between curation and batching, per
    the T5/GPT packing recipe). Deterministic shard-local greedy:

    - shard = doc_id % n_shards; within a shard docs pack in doc_id
      order (byte-stable across runs and engines)
    - a doc joins the open sequence iff fill + n_toks <= capacity,
      else it starts a new one; a doc longer than capacity therefore
      becomes a singleton sequence (kept whole, visibly overflowing —
      truncation is a separate policy decision, not silently applied)

    Returns (doc_id, shard, seq_id, start_tok, n_toks): every doc's
    position in its packed sequence.

    Scale shape: the greedy recurrence is inherently sequential, so it
    runs per shard via applyInPandas — one shuffle on shard, then an
    O(docs/shard) integer loop per group (token counts only; text
    never leaves the JVM scan). Shards pack independently, so the
    cluster scales with n_shards and the only quality cost is one
    possibly-underfull open sequence per shard. At 10^12 docs, pick
    n_shards ~ corpus/executor-memory; determinism survives because
    shard assignment and intra-shard order depend on doc_id alone.
    """
    import pandas as pd

    cap = int(capacity)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(F.split(text_col, " ")).alias("n_toks"),
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq = fill = 0
        seqs, offs = [], []
        for n in pdf["n_toks"]:
            n = int(n)
            if fill and fill + n > cap:
                seq += 1
                fill = 0
            seqs.append(seq)
            offs.append(fill)
            fill += n
        pdf["seq_id"] = seqs
        pdf["start_tok"] = offs
        return pdf[["doc_id", "shard", "seq_id", "start_tok", "n_toks"]]

    return base.groupBy("shard").applyInPandas(
        _pack,
        "doc_id long, shard long, seq_id long, start_tok long, n_toks long",
    )
