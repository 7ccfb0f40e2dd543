"""Unit + plan tests for the round-2 KG additions: PMI co-occurrence,
two-hop path counts (with the hub fanout cap), temporal current-facts
materialization, and global boilerplate n-gram detection.

Reference provenance: these generalize recon's disparity/insight layer
(recon/insights.py:47-110) and the ExampleStore latest-view semantics
(recon/store.py:39-47) to graph-shaped outputs; oracle parity for the
driver queries lives in tests/test_graph_quality.py.
"""

import math

from pyspark.sql import functions as F

from recon_spark.operators.graph import (
    cooccurrence_pmi,
    current_facts,
    two_hop_paths,
)
from recon_spark.operators.textstats import boilerplate_ngrams
from tests.test_plans import plan_of


def test_cooccurrence_small_golden(spark):
    # docs: 1:{a,b,c} 2:{a,b} 3:{a} -> N=3; c(a)=3 c(b)=2 c(c)=1
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (1, "a")]
    df = spark.createDataFrame(rows, "doc_id long, entity string")
    out = {
        (r.a, r.b): (r.pair_docs, r.pmi)
        for r in cooccurrence_pmi(df, min_pairs=1).collect()
    }
    assert out[("a", "b")][0] == 2
    assert out[("a", "b")][1] == round(math.log(3 * 2 / (3 * 2)), 6) == 0.0
    assert out[("a", "c")] == (1, round(math.log(3 * 1 / (3 * 1)), 6))
    assert out[("b", "c")] == (1, round(math.log(3 * 1 / (2 * 1)), 6))
    # min_pairs filter drops the singletons
    kept = cooccurrence_pmi(df, min_pairs=2).collect()
    assert [(r.a, r.b) for r in kept] == [("a", "b")]


def test_cooccurrence_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, entity string")
    out = cooccurrence_pmi(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["a", "b", "pair_docs", "pmi"]


def test_two_hop_exact_and_fanout_cap(spark):
    # hub m: {a,b} -> m -> {x,y,z}; plus direct a->x
    edges = [(s, "m") for s in ("a", "b")] + [("m", d) for d in ("x", "y", "z")]
    edges.append(("a", "x"))
    e = spark.createDataFrame(edges, "src string, dst string")
    exact = {(r.src, r.dst): r.n_paths for r in two_hop_paths(e).collect()}
    # every (a|b) -> (x|y|z) via m, plus a->x->nothing; a->m->{x,y,z}
    assert exact[("a", "x")] == 1 and exact[("b", "z")] == 1
    assert len(exact) == 6
    # generous cap == exact
    capped_full = {
        (r.src, r.dst): r.n_paths for r in two_hop_paths(e, max_fanout=10).collect()
    }
    assert capped_full == exact
    # tight cap: hub m keeps only first out-neighbor (x) and first
    # in-neighbor (a) -> only a->m->x survives
    capped = {
        (r.src, r.dst): r.n_paths for r in two_hop_paths(e, max_fanout=1).collect()
    }
    assert capped == {("a", "x"): 1}
    # cap never invents paths
    assert all(capped_full.get(k, 0) >= v for k, v in capped.items())


def test_current_facts_tiebreak(spark):
    rows = [
        # same (s,p): later ts wins
        ("s", "p", "old", 1, 0),
        ("s", "p", "new", 2, 0),
        # same (s,p,ts): higher pos wins
        ("s2", "p", "first", 5, 0),
        ("s2", "p", "second", 5, 3),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string, ts long, pos int")
    out = {(r.subj, r.pred): (r.obj, r.valid_from) for r in current_facts(t).collect()}
    assert out == {("s", "p"): ("new", 2), ("s2", "p"): ("second", 5)}


def test_current_facts_is_combinable_no_window(spark):
    t = spark.createDataFrame(
        [("s", "p", "o", 1, 0)], "subj string, pred string, obj string, ts long, pos int"
    )
    plan = plan_of(current_facts(t))
    # max_by aggregates partially (no window sort per key)
    assert "Window" not in plan
    assert "partial_max_by" in plan or "ObjectHashAggregate" in plan


def test_boilerplate_ngrams_golden(spark):
    # "w w w w w w" has two distinct 5-grams? no — all tokens equal:
    # 5-gram "w w w w w" occurs twice (positions 1,2).
    docs = [
        (1, "a b c d e f"),     # 5-grams: "a b c d e", "b c d e f"
        (2, "a b c d e"),       # "a b c d e"
        (3, "a b c d e x"),     # "a b c d e", "b c d e x"
        (4, "short text"),      # none
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = [(r.ngram, r.df, r.total) for r in boilerplate_ngrams(df, min_df=2).collect()]
    assert out == [("a b c d e", 3, 3)]
    # within-doc repeats count in total but df counts documents
    df2 = spark.createDataFrame(
        [(1, "w w w w w w"), (2, "w w w w w")], "doc_id long, text string"
    )
    out2 = [(r.ngram, r.df, r.total) for r in boilerplate_ngrams(df2, min_df=2).collect()]
    assert out2 == [("w w w w w", 2, 3)]


def test_cooccurrence_plan_no_python_broadcast_marginals(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id long, entity string")
    plan = plan_of(cooccurrence_pmi(df, min_pairs=1))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # marginal joins are broadcast; the only SortMergeJoin-free shape
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_plan_jvm_only(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = plan_of(boilerplate_ngrams(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_length_quantiles_approx_within_rank_tolerance(spark):
    """The percentile_approx sketch path (the 100-TB path) returns
    discrete order statistics; its guarantee is on RANK error, not
    value error. Assert every sketch quantile sits within 3% of its
    target rank in the group's empirical CDF (sketch ε=1e-4 at
    accuracy=10000, plus ±1/n discretization)."""
    from collections import defaultdict

    from recon_spark.operators.textstats import length_quantiles

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    approx = {
        r.grp: (r.p25, r.p50, r.p75, r.p95)
        for r in length_quantiles(docs, approx=True).collect()
    }
    vals = defaultdict(list)
    for r in docs.select("lang", "n_chars").collect():
        vals[r.lang].append(r.n_chars)
    assert set(approx) == set(vals)
    for g, qs in approx.items():
        xs = sorted(vals[g])
        n = len(xs)
        for p, a in zip((0.25, 0.5, 0.75, 0.95), qs):
            assert a in xs, (g, p, a)  # sketch returns a real data value
            lo = sum(1 for x in xs if x < a) / n
            hi = sum(1 for x in xs if x <= a) / n
            assert lo - 0.03 <= p <= hi + 0.03, (g, p, a, lo, hi)


def test_source_quality_plan_single_shuffle_no_python(spark):
    from recon_spark.operators.textstats import source_quality

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(source_quality(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fuzzy_surface_pairs_exact_vs_bruteforce(spark):
    """Deletion-key blocking must find EXACTLY the levenshtein<=1
    pairs a brute-force all-pairs scan finds (including transposition
    exclusion at distance 2)."""
    import itertools

    from recon_spark.operators.linker import fuzzy_surface_pairs

    vocab = [
        "spark", "spar", "sparc", "shark", "sharks", "park",
        "ab", "ba", "abc", "cab", "a", "b", "xyz",
    ]
    df = spark.createDataFrame([(v,) for v in vocab], "surface string")
    got = {(r.a, r.b) for r in fuzzy_surface_pairs(df).collect()}

    def lev(x, y):
        d = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, d[0] = d[0], i
            for j, cy in enumerate(y, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cx != cy))
        return d[-1]

    want = {
        tuple(sorted((x, y)))
        for x, y in itertools.combinations(vocab, 2)
        if lev(x, y) <= 1
    }
    assert got == want
    assert ("ab", "ba") not in got  # transposition is distance 2


def test_fuzzy_pairs_plan_no_cartesian(spark):
    from recon_spark.operators.linker import fuzzy_surface_pairs

    df = spark.createDataFrame([("spark",), ("spar",)], "surface string")
    plan = plan_of(fuzzy_surface_pairs(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_neardup_matches_batch_semantics(spark):
    """A new doc is flagged iff batch LSH over old+new links it to at
    least one OLD doc (new-new pairs are out of scope by contract)."""
    from recon_spark.operators.dedupe import (
        incremental_neardup,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    inc = {r.id: r.is_dup for r in incremental_neardup(new, old).collect()}
    pairs = minhash_lsh_candidates(docs).collect()
    new_ids = set(inc)
    flagged_by_batch = set()
    for r in pairs:
        a_new, b_new = r.id_a in new_ids, r.id_b in new_ids
        if a_new and not b_new:
            flagged_by_batch.add(r.id_a)
        elif b_new and not a_new:
            flagged_by_batch.add(r.id_b)
    assert {i for i, d in inc.items() if d} == flagged_by_batch
    assert any(inc.values())  # the corpus does contain near-dups


def test_incremental_neardup_plan_semi_join(spark):
    from recon_spark.operators.dedupe import incremental_neardup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(
        incremental_neardup(
            docs.where(F.col("doc_id") % 5 == 0), docs.where(F.col("doc_id") % 5 != 0)
        )
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_segment_dedup_golden(spark):
    """Keep-first at global (doc_id, pos) order; within-doc repeats
    drop too; a doc whose every segment lost keeps md5('')."""
    from recon_spark.operators.dedupe import segment_dedup

    rows = [
        (1, "a|b|a"),   # 'a' kept at (1,0); repeat at (1,2) drops
        (2, "b|c"),     # 'b' lost to doc 1; 'c' kept
        (3, "a|b"),     # everything lost -> empty rebuild
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in segment_dedup(docs, delimiter="|").collect()}
    assert (out[1].n_segs, out[1].n_kept) == (3, 2)
    assert (out[2].n_segs, out[2].n_kept) == (2, 1)
    assert (out[3].n_segs, out[3].n_kept) == (2, 0)
    import hashlib

    assert out[1].new_md5 == hashlib.md5(b"a|b").hexdigest()
    assert out[2].new_md5 == hashlib.md5(b"c").hexdigest()
    assert out[3].new_md5 == hashlib.md5(b"").hexdigest()
    assert out[3].new_len == 0


def test_segment_dedup_plan_no_window_no_python(spark):
    """The first-occurrence owner must be a combinable partial
    aggregate, not a per-segment window sort, and stay JVM-side."""
    from recon_spark.operators.dedupe import segment_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(segment_dedup(docs))
    assert "Window" not in plan
    assert "partial_min" in plan  # map-side combine on the hot segment key
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_resolve_surfaces_transitive_cluster(spark):
    """ab—abc—abcd chain is one cluster (transitive closure over
    ED-1 edges) with the lexicographic min as canonical; 'zzz' is a
    singleton and does not appear."""
    from recon_spark.operators.linker import resolve_surfaces

    surfaces = spark.createDataFrame(
        [("ab",), ("abc",), ("abcd",), ("zzz",)], "surface string"
    )
    out = resolve_surfaces(surfaces).collect()
    assert {(r.surface, r.canonical, r.cluster_size) for r in out} == {
        ("ab", "ab", 3),
        ("abc", "ab", 3),
        ("abcd", "ab", 3),
    }


def test_functional_conflicts_golden(spark):
    from recon_spark.operators.graph import functional_conflicts

    rows = [
        # s1/p1: obj x twice, y once -> conflict, top=x
        ("s1", "p1", "x"), ("s1", "p1", "x"), ("s1", "p1", "y"),
        # s1/p2: single object -> not a conflict
        ("s1", "p2", "x"),
        # s2/p1: tie at cnt=1 -> top is lexicographic min
        ("s2", "p1", "b"), ("s2", "p1", "a"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {(r.subj, r.pred): r for r in functional_conflicts(t).collect()}
    assert set(out) == {("s1", "p1"), ("s2", "p1")}
    assert (out[("s1", "p1")].n_objs, out[("s1", "p1")].support) == (2, 3)
    assert out[("s1", "p1")].top_obj == "x"
    assert out[("s2", "p1")].top_obj == "a"


def test_functional_conflicts_plan_two_aggs_no_join(spark):
    from recon_spark.operators.graph import functional_conflicts

    t = spark.createDataFrame(
        [("s", "p", "o")], "subj string, pred string, obj string"
    )
    plan = plan_of(functional_conflicts(t))
    assert "Join" not in plan  # two stacked aggregates only
    assert "partial_count" in plan or "partial_min" in plan


def test_triangle_stats_golden(spark):
    """Triangle + pendant: nodes a-b-c closed, d hangs off a.
    4 nodes, 4 edges, wedges = 3*1 + C(3,2) (a has deg 3) = 3 + 3... """
    from recon_spark.operators.graph import triangle_stats

    edges = spark.createDataFrame(
        # direction + duplicates + self-loop must not matter
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "d")],
        "src string, dst string",
    )
    r = triangle_stats(edges).collect()[0]
    # degrees: a=3, b=2, c=2, d=1 -> wedges = 3 + 1 + 1 + 0 = 5
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 4, 5, 1)
    assert r.clustering == 0.6  # 3*1/5


def test_triangle_stats_triangle_free(spark):
    from recon_spark.operators.graph import triangle_stats

    # star graph: wedge-rich, triangle-free
    edges = spark.createDataFrame(
        [("hub", x) for x in ("a", "b", "c", "d")], "src string, dst string"
    )
    r = triangle_stats(edges).collect()[0]
    assert r.n_triangles == 0 and r.n_wedges == 6


def test_kg_diff_golden(spark):
    from recon_spark.operators.graph import kg_diff

    old = spark.createDataFrame(
        [("s", "p", "o", 2), ("s", "p", "q", 1), ("x", "p", "y", 3)],
        "subj string, pred string, obj string, n long",
    )
    new = spark.createDataFrame(
        [("s", "p", "o", 2), ("s", "p", "q", 5), ("a", "p", "b", 1)],
        "subj string, pred string, obj string, n long",
    )
    out = {r.status: r.n_triples for r in kg_diff(old, new).collect()}
    assert out == {"added": 1, "removed": 1, "count_changed": 1, "unchanged": 1}


def test_kg_diff_identity_is_all_unchanged(spark):
    """The incremental-rebuild gate: same input -> zero churn."""
    from recon_spark.operators.graph import kg_diff

    t = spark.createDataFrame(
        [("s", "p", "o", 2), ("x", "p", "y", 3)],
        "subj string, pred string, obj string, n long",
    )
    out = {r.status: r.n_triples for r in kg_diff(t, t).collect()}
    assert out == {"unchanged": 2}


def test_neighbor_merge_candidates_golden(spark):
    from recon_spark.operators.graph import neighbor_merge_candidates

    edges = spark.createDataFrame(
        # a -> {x, y, z}; b -> {x, y}; c -> {q}
        [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "y"), ("c", "q")],
        "src string, dst string",
    )
    out = neighbor_merge_candidates(edges, threshold=0.5).collect()
    assert [(r.a, r.b, r.shared, r.jaccard) for r in out] == [
        ("a", "b", 2, round(2 / 3, 6))
    ]
    # raise the threshold past 2/3 -> empty
    assert neighbor_merge_candidates(edges, threshold=0.7).count() == 0


def test_neighbor_merge_candidates_posting_cap(spark):
    """max_posting truncates each neighbor's posting list by source id:
    with cap 2 the 'x' posting keeps {a, b} and drops c, so the (a, c)
    and (b, c) overlaps via x disappear."""
    from recon_spark.operators.graph import neighbor_merge_candidates

    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], "src string, dst string"
    )
    full = {(r.a, r.b) for r in neighbor_merge_candidates(edges, 0.5).collect()}
    capped = {
        (r.a, r.b)
        for r in neighbor_merge_candidates(edges, 0.5, max_posting=2).collect()
    }
    assert full == {("a", "b"), ("a", "c"), ("b", "c")}
    assert capped == {("a", "b")}


def test_triangle_and_merge_plans_no_cartesian(spark):
    from recon_spark.operators.graph import (
        neighbor_merge_candidates,
        triangle_stats,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    for df in (triangle_stats(edges), neighbor_merge_candidates(edges)):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # triangle_stats' only nested-loop join is the final 1x1 stats cross;
    # the wedge work must all be equi-joins
    tri_plan = plan_of(triangle_stats(edges))
    assert tri_plan.count("BroadcastNestedLoopJoin") <= 1
    merge_plan = plan_of(neighbor_merge_candidates(edges))
    assert "BroadcastNestedLoopJoin" not in merge_plan


def test_chunk_documents_golden(spark):
    from recon_spark.operators.textstats import chunk_documents

    # 10 tokens, chunk 4 / stride 3 -> starts 0,3,6 and the last start
    # ceil((10-4)/3)=2 -> 0,3,6; chunk at 6 gets tokens 7..10
    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.id, []).append((r.chunk_id, r.start_tok, r.n_toks))
    assert by_doc[1] == [(0, 0, 4), (1, 3, 4), (2, 6, 4)]
    assert by_doc[2] == [(0, 0, 2)]  # short doc -> exactly one chunk
    # full coverage: last chunk reaches the final token
    assert max(s + n for _, s, n in by_doc[1]) == 10


def test_chunk_documents_plan_map_only(spark):
    from recon_spark.operators.textstats import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    body = plan_of(chunk_documents(docs))
    # the chunking itself must stay JVM-side; the ONLY exchange allowed
    # is the final presentation orderBy's range partitioning
    assert "BatchEvalPython" not in body and "ArrowEvalPython" not in body
    assert body.count("Exchange") <= 1
    assert "rangepartitioning" in body.lower() or body.count("Exchange") == 0
