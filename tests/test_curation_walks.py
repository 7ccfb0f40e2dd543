"""Round-2 curation + graph additions: n-gram benchmark
decontamination, deterministic source mixing, random walks, k-core.
Hand-computed goldens + plan shape; oracle parity runs via the
registry-parametrized test_oracles_pipeline / test_graph_quality."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from recon_spark.operators.curation import (
    _rate_threshold_hex,
    doc_ngrams,
    ngram_contamination,
    source_mix_sample,
)
from recon_spark.operators.graph import kcore, random_walks


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# doc_ngrams / ngram_contamination
# --------------------------------------------------------------------------

def test_doc_ngrams_golden(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "p q r")],
        "doc_id long, text string",
    )
    out = sorted((r.id, r.ngram) for r in doc_ngrams(docs, 3).collect())
    # doc 2 is shorter than n -> contributes nothing
    assert out == [(1, "a b c"), (1, "b c d"), (3, "p q r")]


def test_ngram_contamination_golden(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # contains bench 3-grams
            (2, "the quick brown fox sleeps"),  # shares 2 of them
            (3, "totally unrelated text here"),
            (4, "quick brown fox quick brown fox jumps"),  # repeat hits
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_contamination(corpus, bench, n=3).collect()}
    # bench 3-grams: {the quick brown, quick brown fox, brown fox jumps}
    assert set(rows) == {1, 2, 4}
    assert (rows[1].n_hits, rows[1].n_distinct_hits) == (3, 3)
    assert (rows[2].n_hits, rows[2].n_distinct_hits) == (2, 2)
    # doc 4: 'quick brown fox' x2, 'brown fox quick' no, 'fox quick brown'
    # no, 'brown fox jumps' x1 -> 3 hits over 2 distinct grams
    assert (rows[4].n_hits, rows[4].n_distinct_hits) == (3, 2)


def test_ngram_contamination_plan_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 29 == 0)
    body = plan_of(ngram_contamination(docs, bench, n=8))
    # benchmark digest set must broadcast; corpus n-grams stay JVM-side
    assert "BroadcastHashJoin" in body
    assert "BatchEvalPython" not in body and "ArrowEvalPython" not in body


# --------------------------------------------------------------------------
# source_mix_sample
# --------------------------------------------------------------------------

def test_rate_threshold_hex():
    assert _rate_threshold_hex(0.0) == "00000000"
    assert _rate_threshold_hex(1.0) == "g"  # above every hex draw
    assert _rate_threshold_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        _rate_threshold_hex(1.5)


def test_source_mix_sample_deterministic_and_correct(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}", "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id long, text string, source string",
    )
    kept = source_mix_sample(docs, {"a": 0.3, "b": 1.0}).collect()
    # python replica of the exact decision rule
    def keep(i, s, rate):
        u = hashlib.md5(f"{i}|{s}".encode()).hexdigest()[:8]
        return u < _rate_threshold_hex(rate)

    expect = {
        (i, "a" if i % 2 == 0 else "b")
        for i in range(200)
        if keep(i, "a" if i % 2 == 0 else "b", 0.3 if i % 2 == 0 else 1.0)
    }
    assert {(r.doc_id, r.source) for r in kept} == expect
    # rate 1.0 keeps every doc of source b
    assert sum(1 for r in kept if r.source == "b") == 100
    # repeated run -> identical keep set (pure function of the row)
    again = source_mix_sample(docs, {"a": 0.3, "b": 1.0}).collect()
    assert {(r.doc_id,) for r in again} == {(r.doc_id,) for r in kept}


def test_source_mix_sample_plan_map_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    body = plan_of(source_mix_sample(docs, {"src0": 0.5}))
    assert "Exchange" not in body  # pure map-side filter
    assert "BatchEvalPython" not in body and "ArrowEvalPython" not in body


# --------------------------------------------------------------------------
# random_walks
# --------------------------------------------------------------------------

def test_random_walks_golden(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    out = random_walks(edges, walk_len=2, walks_per_node=1).collect()
    # python replica of the deterministic draw
    adj = {"a": ["b", "c"], "b": ["c"], "c": ["a"]}

    def draw(node, walk, step, size):
        h = hashlib.md5(f"{node}|{walk}|{step}".encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % size

    expect = []
    for start in adj:
        cur = start
        expect.append((start, 0, 0, cur))
        for t in (1, 2):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = nbrs[draw(cur, 0, t, len(nbrs))]
            expect.append((start, 0, t, cur))
    assert sorted((r.start, r.walk, r.step, r.node) for r in out) == sorted(expect)


def test_random_walks_every_step_follows_an_edge(spark):
    from recon_spark.queries.graph import _canonical_edges

    e = _canonical_edges(spark, "/root/testdata/sf0.001").persist()
    walks = random_walks(e).collect()
    edge_set = {(r.src, r.dst) for r in e.collect()}
    by_walk: dict = {}
    for r in walks:
        by_walk.setdefault((r.start, r.walk), []).append((r.step, r.node))
    for (start, _), steps in by_walk.items():
        steps.sort()
        assert steps[0] == (0, start)
        # consecutive steps traverse real edges, with no step skipped
        for (s0, n0), (s1, n1) in zip(steps, steps[1:]):
            assert s1 == s0 + 1
            assert (n0, n1) in edge_set


# --------------------------------------------------------------------------
# kcore
# --------------------------------------------------------------------------

def test_kcore_golden_triangle_with_tail(spark):
    # triangle a-b-c plus a pendant chain c-d-e: 2-core = the triangle
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    rows = sorted((r.node, r.degree) for r in kcore(edges, k=2, iters=3).collect())
    assert rows == [("a", 2), ("b", 2), ("c", 2)]


def test_kcore_converged_iters_stable(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "src string, dst string",
    )
    r3 = sorted(map(tuple, kcore(edges, k=2, iters=3).collect()))
    r5 = sorted(map(tuple, kcore(edges, k=2, iters=5).collect()))
    assert r3 == r5  # extra rounds past convergence are no-ops


def test_kcore_empty_core(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    assert kcore(edges, k=3, iters=2).count() == 0


# --------------------------------------------------------------------------
# fact_history
# --------------------------------------------------------------------------

def test_fact_history_golden(spark):
    from datetime import datetime

    from recon_spark.operators.graph import fact_history

    rows = [
        # s1/p: a @1, a @2 (re-assert, collapses), b @3, a @5
        ("s1", "p", "a", datetime(2020, 1, 1, 0, 0, 1), 0),
        ("s1", "p", "a", datetime(2020, 1, 1, 0, 0, 2), 0),
        ("s1", "p", "b", datetime(2020, 1, 1, 0, 0, 3), 0),
        ("s1", "p", "a", datetime(2020, 1, 1, 0, 0, 5), 0),
        # s2/q: single assertion, open-ended
        ("s2", "q", "x", datetime(2020, 1, 1, 0, 0, 9), 0),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts timestamp, pos int"
    )
    out = [
        (r.subj, r.pred, r.obj, r.valid_from.second,
         r.valid_to.second if r.valid_to else None)
        for r in fact_history(t).collect()
    ]
    assert out == [
        ("s1", "p", "a", 1, 3),
        ("s1", "p", "b", 3, 5),
        ("s1", "p", "a", 5, None),
        ("s2", "q", "x", 9, None),
    ]


def test_fact_history_current_slice_matches_current_facts(spark):
    from recon_spark.operators.extraction import extract_triples_tokens
    from recon_spark.operators.graph import current_facts, fact_history
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = extract_triples_tokens(docs).withColumn(
        "ts",
        F.expr("timestamp'2020-01-01 00:00:00' + make_dt_interval(0, 0, 0, doc_id)"),
    )
    hist = {
        (r.subj, r.pred, r.obj)
        for r in fact_history(t).where("valid_to IS NULL").collect()
    }
    cur = {(r.subj, r.pred, r.obj) for r in current_facts(t).collect()}
    assert hist == cur


# --------------------------------------------------------------------------
# negative_samples
# --------------------------------------------------------------------------

def test_negative_samples_properties(spark):
    from recon_spark.operators.graph import negative_samples

    t = spark.createDataFrame(
        [("a", "likes", "b"), ("b", "likes", "c"), ("c", "knows", "a"),
         ("d", "knows", "b")],
        "subj string, pred string, obj string",
    )
    out = negative_samples(t, k=4).collect()
    true = {("a", "likes", "b"), ("b", "likes", "c"), ("c", "knows", "a"),
            ("d", "knows", "b")}
    vocab = {"a", "b", "c", "d"}
    assert out, "expected some negatives from 4 triples x 4 draws"
    for r in out:
        assert (r.subj, r.pred, r.obj) not in true  # filtered negatives
        assert r.subj != r.obj  # no degenerate self-loops
        assert r.subj in vocab and r.obj in vocab
        assert r.side in ("subj", "obj")
        assert 1 <= r.neg_j <= 4
    # deterministic: second run byte-identical
    again = negative_samples(t, k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_draw_matches_python_replica(spark):
    import hashlib

    from recon_spark.operators.graph import negative_samples

    t = spark.createDataFrame(
        [("a", "r", "b"), ("b", "r", "c")], "subj string, pred string, obj string"
    )
    vocab = sorted({"a", "b", "c"})
    expect = set()
    for s, p, o in [("a", "r", "b"), ("b", "r", "c")]:
        for j in (1, 2, 3, 4):
            side = "obj" if j % 2 == 1 else "subj"
            h = hashlib.md5(f"{s}|{p}|{o}|{j}".encode()).hexdigest()
            e = vocab[int(h[:8], 16) % len(vocab)]
            ns, no = (e, o) if side == "subj" else (s, e)
            orig = s if side == "subj" else o
            if e == orig or ns == no or (ns, p, no) in {("a", "r", "b"), ("b", "r", "c")}:
                continue
            expect.add((ns, p, no, j, side))
    got = {tuple(r) for r in negative_samples(t, k=4).collect()}
    assert got == expect


# --------------------------------------------------------------------------
# term_spectrum
# --------------------------------------------------------------------------

def test_term_spectrum_golden(spark):
    from recon_spark.operators.textstats import term_spectrum

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c c"), (3, "c")], "doc_id long, text string"
    )
    # freqs: a=3, b=1, c=3
    rows = [(r.freq, r.n_terms, r.n_tokens)
            for r in term_spectrum(docs, max_freq=2).collect()]
    assert rows == [("1", 1, 1), ("3+", 2, 6)]
    # token mass check: buckets partition all tokens
    assert sum(r[2] for r in rows) == 7


# --------------------------------------------------------------------------
# predicate_stats
# --------------------------------------------------------------------------

def test_predicate_stats_golden(spark):
    from recon_spark.operators.graph import predicate_stats

    t = spark.createDataFrame(
        [
            ("a", "born_in", "x"), ("a", "born_in", "x"),  # duplicate assertion
            ("b", "born_in", "y"), ("c", "born_in", "y"),
            ("a", "likes", "p"), ("a", "likes", "q"), ("b", "likes", "p"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {r.pred: r for r in predicate_stats(t).collect()}
    b = rows["born_in"]
    # pairs: (a,x) (b,y) (c,y); subj a,b,c; obj x,y
    assert (b.n_triples, b.n_subj, b.n_obj) == (4, 3, 2)
    assert b.functionality == 1.0          # 3 subj / 3 pairs
    assert round(b.inv_functionality, 6) == round(2 / 3, 6)
    l = rows["likes"]
    assert (l.n_triples, l.n_subj, l.n_obj) == (3, 2, 2)
    assert round(l.functionality, 6) == round(2 / 3, 6)  # 2 subj / 3 pairs


# --------------------------------------------------------------------------
# hashed_linear_score
# --------------------------------------------------------------------------

def test_hashed_linear_score_python_replica(spark):
    import math

    from recon_spark.operators.curation import hashed_linear_score

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "zz")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in hashed_linear_score(docs).collect()}

    def w(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:4], 16) / 65535.0 - 0.5

    for did, text in [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "zz")]:
        toks = text.split()
        exp = 1.0 / (1.0 + math.exp(-sum(w(t) for t in toks)))
        assert rows[did].n_terms == len(toks)
        assert abs(rows[did].score - exp) < 1e-6
        assert rows[did].keep == (rows[did].score >= 0.5)


def test_hashed_linear_score_plan_map_only(spark):
    from recon_spark.operators.curation import hashed_linear_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    body = plan_of(hashed_linear_score(docs))
    assert "BatchEvalPython" not in body and "ArrowEvalPython" not in body
    # only the presentation orderBy's range partitioning may exchange
    assert body.count("Exchange") <= 1


def test_hashed_linear_score_drops_zero_token_docs(spark):
    # empty/whitespace-only text has no evidence either way; the operator
    # drops it exactly like the oracle's unnest + WHERE t <> '' does
    from recon_spark.operators.curation import hashed_linear_score

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   "), (4, "ok")],
        "doc_id long, text string",
    )
    ids = sorted(r.doc_id for r in hashed_linear_score(docs).collect())
    assert ids == [1, 4]


def test_source_mix_sample_null_source_draws_at_default(spark):
    # NULL source coalesces to '' on both the md5 key and the rate
    # lookup, so the doc draws at default_rate with key doc_id|''
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "src0"), (4, None)],
        "doc_id long, source string",
    )
    kept = source_mix_sample(
        docs, rates={"src0": 0.0}, default_rate=1.0
    ).collect()
    # default_rate=1.0 keeps every NULL-source doc; src0 at 0.0 drops
    assert sorted(r.doc_id for r in kept) == [1, 2, 4]
    for r in kept:
        exp = hashlib.md5(f"{r.doc_id}|".encode()).hexdigest()[:8]
        assert r.u_hex == exp


def test_trained_quality_score_weights_are_trained(spark):
    # the committed table must actually reflect the training signal:
    # noise tokens get the most negative weights
    from recon_spark.operators.curation import load_quality_weights

    w = {r.term: r.weight for r in load_quality_weights(spark).collect()}
    assert "__bias__" in w and len(w) >= 30
    noise = sorted(w, key=w.get)[:2]
    assert set(noise) == {"slow", "small"}


def test_trained_quality_score_python_replica(spark):
    import math

    from recon_spark.operators.curation import (
        load_quality_weights,
        trained_quality_score,
    )

    wdf = load_quality_weights(spark)
    w = {r.term: r.weight_micro for r in wdf.collect()}
    bias = w.pop("__bias__")
    docs = spark.createDataFrame(
        [(1, "slow slow small dup"), (2, "fast data spark table"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in trained_quality_score(docs, wdf).collect()}
    assert 3 not in rows  # zero-token doc dropped
    for did, text in [(1, "slow slow small dup"), (2, "fast data spark table")]:
        toks = text.split()
        s = 1.0 / (1.0 + math.exp(-((bias + sum(w.get(t, 0) for t in toks)) / 1e6)))
        assert rows[did].n_terms == len(toks)
        assert abs(rows[did].score - s) < 1e-6
    # the noise doc must score lower than the clean doc
    assert rows[1].score < rows[2].score


def test_trained_quality_score_plan_broadcast_map_side(spark):
    from recon_spark.operators.curation import (
        load_quality_weights,
        trained_quality_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    body = plan_of(trained_quality_score(docs, load_quality_weights(spark)))
    assert "BroadcastHashJoin" in body  # weights are a broadcast dim
    assert "BatchEvalPython" not in body and "ArrowEvalPython" not in body
    assert "SortMergeJoin" not in body  # corpus text never shuffles for the join
