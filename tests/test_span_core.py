"""Golden tests for the pure-Python span kernels, mirroring the
reference's observable semantics (overlap cases shaped like
tests/test_validation.py:37-105; strip/substitute offset arithmetic of
tests/test_corrections.py and tests/test_augmentation.py)."""

from recon_spark.core.spans import (
    align_spans_to_tokens,
    filter_overlaps,
    split_sentences,
    strip_annotation,
    substitute_spans,
    tokenize_ws,
)


def sp(start, end, label="L", text=None):
    return {"text": text or "x" * (end - start), "start": start, "end": end, "label": label}


def keys(spans):
    return [(s["start"], s["end"]) for s in spans]


class TestFilterOverlaps:
    def test_empty(self):
        assert filter_overlaps([]) == []

    def test_no_overlap_passthrough(self):
        spans = [sp(0, 3), sp(5, 9), sp(12, 20)]
        assert keys(filter_overlaps(spans)) == [(0, 3), (5, 9), (12, 20)]

    def test_identical_spans_keeps_one(self):
        assert keys(filter_overlaps([sp(0, 5), sp(0, 5)])) == [(0, 5)]

    def test_contained_keeps_longest(self):
        assert keys(filter_overlaps([sp(0, 10), sp(2, 5)])) == [(0, 10)]

    def test_partial_overlap_keeps_longest(self):
        assert keys(filter_overlaps([sp(0, 6), sp(4, 12)])) == [(4, 12)]

    def test_chain_of_three_greedy(self):
        # chain 0-6, 5-8, 7-15: longest 7-15 kept, then 0-6 fits
        assert keys(filter_overlaps([sp(0, 6), sp(5, 8), sp(7, 15)])) == [(0, 6), (7, 15)]

    def test_equal_length_tie_keeps_first(self):
        assert keys(filter_overlaps([sp(0, 5), sp(3, 8)])) == [(0, 5)]

    def test_two_separate_chains(self):
        spans = [sp(0, 4), sp(2, 6), sp(10, 14), sp(13, 20)]
        # chain 1 ties on length -> stable keep-first; chain 2 keeps longest
        assert keys(filter_overlaps(spans)) == [(0, 4), (13, 20)]

    def test_touching_spans_not_overlapping(self):
        # [0,5) and [5,9) share no char -> both kept
        assert keys(filter_overlaps([sp(0, 5), sp(5, 9)])) == [(0, 5), (5, 9)]

    def test_long_span_swallows_chain(self):
        spans = [sp(0, 20), sp(1, 3), sp(4, 8), sp(9, 19)]
        assert keys(filter_overlaps(spans)) == [(0, 20)]


class TestStripAnnotation:
    def test_strip_both_ends(self):
        text = "the span. rest"
        s = {"text": " span.", "start": 3, "end": 9, "label": "L"}
        out = strip_annotation(s)
        assert (out["text"], out["start"], out["end"]) == ("span", 4, 8)
        assert text[out["start"] : out["end"]] == out["text"]

    def test_no_strip_needed(self):
        s = {"text": "span", "start": 0, "end": 4, "label": "L"}
        assert strip_annotation(s) == s

    def test_all_strip_chars_drops(self):
        assert strip_annotation({"text": "..! ", "start": 0, "end": 4, "label": "L"}) is None


class TestSubstituteSpans:
    def test_offsets_rebased(self):
        text = "I love apples and bananas"
        spans = [sp(7, 13, "FRUIT", "apples"), sp(18, 25, "FRUIT", "bananas")]
        new_text, new_spans = substitute_spans(
            text, spans, {(7, 13): "kiwi", (18, 25): "dragonfruit"}
        )
        assert new_text == "I love kiwi and dragonfruit"
        for s in new_spans:
            assert new_text[s["start"] : s["end"]] == s["text"]
        assert new_spans[0]["text"] == "kiwi"
        assert new_spans[1]["text"] == "dragonfruit"

    def test_identity_when_no_replacements(self):
        text = "a b c"
        spans = [sp(2, 3, "X", "b")]
        new_text, new_spans = substitute_spans(text, spans, {})
        assert new_text == text and keys(new_spans) == [(2, 3)]


class TestSplitSentences:
    def test_offsets_relative_to_sentence(self):
        text = "spark joins tables. data flows fast"
        spans = [sp(0, 5, "TECH", "spark"), sp(20, 24, "DATA", "data")]
        parts = split_sentences(text, spans)
        assert [p[0] for p in parts] == ["spark joins tables", "data flows fast"]
        s0, s1 = parts[0][1], parts[1][1]
        assert keys(s0) == [(0, 5)] and keys(s1) == [(0, 4)]
        for sent, spl in parts:
            for s in spl:
                assert sent[s["start"] : s["end"]] == s["text"]

    def test_boundary_crossing_span_dropped(self):
        text = "ab cd. ef"
        spans = [{"text": "cd. ef", "start": 3, "end": 9, "label": "X"}]
        parts = split_sentences(text, spans)
        assert all(not p[1] for p in parts)


class TestTokenize:
    def test_offsets(self):
        toks = tokenize_ws("ab  c def")
        assert toks == [("ab", 0, 2, 0), ("c", 4, 5, 1), ("def", 6, 9, 2)]

    def test_alignment_gate(self):
        toks = tokenize_ws("spark joins tables")
        ok = align_spans_to_tokens([sp(0, 5, "T", "spark")], toks)
        assert ok and ok[0]["token_start"] == 0 and ok[0]["token_end"] == 0
        misaligned = align_spans_to_tokens([sp(1, 4, "T", "par")], toks)
        assert misaligned is None


def test_filter_overlaps_jvm_matches_pandas_kernel(spark):
    """The JVM array_sort+aggregate greedy must be bit-equal to the
    pandas kernel on the gold∪model overlap workload."""
    from pyspark.sql import functions as F

    from recon_spark.operators.extraction import detect_mentions
    from recon_spark.operators.validation import filter_overlaps, filter_overlaps_jvm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = detect_mentions(docs)
    gp = detect_mentions(g, which="model", out_col="pred_spans")
    merged = gp.withColumn("spans", F.expr("concat(spans, pred_spans)")).select(
        "doc_id", "text", "spans"
    )
    a = {r["doc_id"]: r["spans"] for r in filter_overlaps(merged).collect()}
    b = {r["doc_id"]: r["spans"] for r in filter_overlaps_jvm(merged).collect()}
    assert a == b


def test_split_sentences_jvm_matches_arrow_kernel(spark):
    """The JVM fold split must be bit-equal to the mapInArrow kernel."""
    from recon_spark.operators.corrections import split_sentences, split_sentences_jvm
    from recon_spark.operators.extraction import detect_mentions

    d = detect_mentions(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ).select("doc_id", "text", "spans")
    key = lambda r: (r["doc_id"], r["sent_id"], r["text"], tuple(map(tuple, r["spans"])))
    a = sorted(map(key, split_sentences(d, delimiter=" the ").collect()))
    b = sorted(map(key, split_sentences_jvm(d, delimiter=" the ").collect()))
    assert a == b


def test_add_tokens_arrow_matches_jvm_fold(spark):
    from recon_spark.operators.extraction import detect_mentions
    from recon_spark.operators.validation import add_tokens, add_tokens_arrow

    d = detect_mentions(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    key = lambda r: (
        r["doc_id"],
        tuple(map(tuple, r["tokens"])),
        tuple(map(tuple, r["spans"])),
    )
    a = sorted(map(key, add_tokens(d).select("doc_id", "tokens", "spans").collect()))
    b = sorted(map(key, add_tokens_arrow(d).select("doc_id", "tokens", "spans").collect()))
    assert a == b
