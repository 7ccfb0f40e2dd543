"""compute_once caching, prodigy-style merge, IOB tag reconstruction."""

from pyspark.sql import functions as F

from recon_spark.operators.preprocess import compute_once, iob_to_spans, merge_corrected
from recon_spark.operators.validation import add_tokens


def test_compute_once_runs_fn_per_distinct_key(spark):
    df = spark.createDataFrame(
        [(i, "dup text" if i % 2 == 0 else f"text {i}") for i in range(10)],
        "id long, text string",
    )
    calls = spark.sparkContext.accumulator(0)

    def fn(d):
        @F.udf("int")
        def probe(t):
            calls.add(1)
            return len(t)

        return d.withColumn("n", probe("text"))

    out = compute_once(df, "text", fn, ["n"]).collect()
    assert len(out) == 10
    assert all(r["n"] == len(r["text"]) for r in out)
    assert calls.value == 6  # 5 distinct odd texts + 1 shared even text


def test_merge_corrected_prefers_correction(spark):
    df = spark.createDataFrame(
        [("a", "OLD1"), ("b", "OLD2"), ("c", "OLD3")], "text string, label string"
    )
    corr = spark.createDataFrame([("b", "NEW")], "text string, label string")
    out = {r["text"]: r["label"] for r in merge_corrected(df, corr).collect()}
    assert out == {"a": "OLD1", "b": "NEW", "c": "OLD3"}


def test_iob_to_spans_reconstruction(spark):
    text = "apache spark beats plain mapreduce says the dev"
    tags = ["B-TECH", "I-TECH", "O", "O", "B-TECH", "O", "O", "B-ROLE"]
    df = spark.createDataFrame([(1, text, tags, [])],
        "id long, text string, tags array<string>, spans array<struct<"
        "text: string, start: int, end: int, label: string, token_start: int,"
        "token_end: int, kb_id: string, source: string>>",
    )
    df = add_tokens(df, drop_misaligned=False)
    out = df.withColumn("spans", iob_to_spans()).withColumn(
        "spans",
        F.expr(
            "transform(spans, s -> named_struct("
            "'text', substring(text, s.start + 1, s.end - s.start),"
            "'start', s.start, 'end', s.end, 'label', s.label,"
            "'token_start', s.token_start, 'token_end', s.token_end,"
            "'kb_id', s.kb_id, 'source', s.source))"
        ),
    )
    spans = out.collect()[0]["spans"]
    got = [(s["text"], s["label"], s["token_start"], s["token_end"]) for s in spans]
    assert got == [
        ("apache spark", "TECH", 0, 1),
        ("mapreduce", "TECH", 4, 4),
        ("dev", "ROLE", 7, 7),
    ]
    for s in spans:
        assert text[s["start"] : s["end"]] == s["text"]


def test_iob_repair_orphan_i_tag(spark):
    # IOB2 repair: orphan I- starts a new span (reference re-derivation)
    text = "x spark y"
    tags = ["O", "I-TECH", "O"]
    df = spark.createDataFrame([(1, text, tags, [])],
        "id long, text string, tags array<string>, spans array<struct<"
        "text: string, start: int, end: int, label: string, token_start: int,"
        "token_end: int, kb_id: string, source: string>>",
    )
    df = add_tokens(df, drop_misaligned=False)
    spans = df.withColumn("spans", iob_to_spans()).collect()[0]["spans"]
    assert [(s["start"], s["end"], s["label"]) for s in spans] == [(2, 7, "TECH")]


def test_bpe_token_counts_on_punctuation(spark):
    """BPE-ish pre-tokenizer splits contractions, punctuation runs, and
    digit runs — cross-checked against DuckDB RE2 in the oracle suite;
    here the exact counts on punctuation-rich strings."""
    from recon_spark.operators.textstats import token_counts

    df = spark.createDataFrame(
        [(0, "don't stop! 123 abc-def"), (1, "hello world"), (2, "a'll b're c,d;e")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in token_counts(df).collect()}
    assert rows == {0: (4, 8), 1: (2, 2), 2: (3, 9)}
