"""Graph analytics (PageRank, degrees) + repetition metrics + PII
redaction: hand-computed goldens and DuckDB oracle parity."""

import math

import pytest

from tests.conftest import SF_SMOKE, compare_query

from recon_spark.operators.graph import DAMPING, PR_ITERATIONS, degree_stats, pagerank
from recon_spark.operators.textstats import pii_redact, repetition_metrics
from recon_spark.queries.graph import ORACLES, QUERIES


def _pagerank_py(edges, iterations=PR_ITERATIONS, d=DAMPING):
    """Independent single-process reference of the pinned spec."""
    e = sorted(set((a, b) for a, b in edges if a != b))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    outd = {}
    for a, _ in e:
        outd[a] = outd.get(a, 0) + 1
    ranks = {u: round(1.0 / n, 6) for u in nodes}
    for _ in range(iterations):
        contrib = {u: 0.0 for u in nodes}
        for a, b in e:
            contrib[b] += ranks[a] / outd[a]
        dm = sum(ranks[u] for u in nodes if u not in outd)
        ranks = {
            u: round((1.0 - d) / n + d * (contrib[u] + dm / n), 6) for u in nodes
        }
    return ranks


def test_pagerank_golden_dangling(spark):
    # a->b, a->c, b->c: c is dangling; its mass redistributes uniformly
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")]  # dup edge collapses
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["entity"]: r["rank"] for r in pagerank(df).collect()}
    want = _pagerank_py(edges)
    assert got == want
    # sanity: c (two in-edges) outranks b outranks a
    assert got["c"] > got["b"] > got["a"]
    # total mass conserved up to rounding
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_cycle_uniform(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r["entity"]: r["rank"] for r in pagerank(df).collect()}
    assert got == {"a": round(1 / 3, 6), "b": round(1 / 3, 6), "c": round(1 / 3, 6)}


def test_degree_stats_golden(spark):
    # a: deg 3 (2 out + 1 in), b: 2, c: 2, d: 1; self-loop dropped
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "d"), ("d", "d")],
        "src string, dst string",
    )
    got = {r["degree"]: r["n_entities"] for r in degree_stats(df).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_repetition_metrics_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a a b"),          # dup word 'a' x2 of 3 tokens
            (2, "x y x y x"),      # 'x y' bigram twice, 'y x' twice
            (3, "solo"),           # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 3
    assert r1["dup_word_frac"] == round(2 / 3, 6)
    assert r1["dup_bigram_char_frac"] == 0.0  # 'a a', 'a b' each once
    assert r1["top_bigram"] == "a a"  # tie at cnt=1 -> lexicographically first
    assert r1["top_bigram_char_frac"] == round(3 / 5, 6)
    r2 = rows[2]
    # bigrams: 'x y' x2, 'y x' x2 -> all 4 occurrences duplicated,
    # 4*3 chars / 9 chars, capped at 1
    assert r2["dup_word_frac"] == 1.0
    assert r2["dup_bigram_char_frac"] == 1.0
    assert r2["top_bigram"] == "x y"
    r3 = rows[3]
    assert (r3["dup_bigram_char_frac"], r3["top_bigram"]) == (0.0, "")


def test_pii_redact_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@ex-ample.org or 10.0.0.1 tel 555-123-4567 end"),
            (2, "clean text with 1234 and 1.2 only"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}
    assert rows[1]["n_emails"] == 1
    assert rows[1]["n_ips"] == 1
    assert rows[1]["n_phones"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> or <IP> tel <PHONE> end"
    assert rows[2] == {
        "doc_id": 2,
        "n_emails": 0,
        "n_ips": 0,
        "n_phones": 0,
        "redacted": "clean text with 1234 and 1.2 only",
    }


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_graph_query_oracles(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name], SF_SMOKE)
