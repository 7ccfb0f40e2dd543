"""Sequence packing (textstats.pack_sequences) edge cases: the greedy
recurrence's boundary behavior, oversized-doc singletons, and
determinism across partitionings. The registry oracle (WITH RECURSIVE
replay in queries/pipeline.py) covers the bulk statistics; these pin
the corner semantics explicitly."""

from pyspark.sql import functions as F

from recon_spark.operators.textstats import pack_sequences


def _pack(spark, rows, capacity, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, capacity=capacity, n_shards=n_shards)
    return {
        r.doc_id: (r.shard, r.seq_id, r.start_tok, r.n_toks)
        for r in out.collect()
    }


def test_exact_fill_boundary(spark):
    # 3+5=8 fills capacity exactly -> third doc opens seq 1
    got = _pack(
        spark,
        [(0, "a b c"), (1, "d e f g h"), (2, "i j")],
        capacity=8,
    )
    assert got == {0: (0, 0, 0, 3), 1: (0, 0, 3, 5), 2: (0, 1, 0, 2)}


def test_oversized_doc_is_singleton(spark):
    # doc 1 (6 toks) exceeds capacity 4: it keeps its own sequence,
    # visibly overflowing, and doc 2 starts fresh after it
    got = _pack(
        spark,
        [(0, "a b c"), (1, "p q r s t u"), (2, "x")],
        capacity=4,
    )
    assert got == {0: (0, 0, 0, 3), 1: (0, 1, 0, 6), 2: (0, 2, 0, 1)}


def test_first_doc_oversized(spark):
    got = _pack(spark, [(0, "a b c d e"), (1, "x y")], capacity=3)
    assert got == {0: (0, 0, 0, 5), 1: (0, 1, 0, 2)}


def test_shard_independence_and_determinism(spark):
    rows = [(i, " ".join(["t"] * (1 + i % 7))) for i in range(200)]
    a = _pack(spark, rows, capacity=16, n_shards=4)
    # same input through a different initial partitioning: identical
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        .repartition(13)
    )
    b = {
        r.doc_id: (r.shard, r.seq_id, r.start_tok, r.n_toks)
        for r in pack_sequences(df, capacity=16, n_shards=4).collect()
    }
    assert a == b
    # shard assignment is doc_id % n_shards
    assert all(v[0] == k % 4 for k, v in a.items())
    # no open sequence exceeds capacity unless it is a singleton
    from collections import defaultdict

    fills = defaultdict(int)
    members = defaultdict(int)
    for _, (sh, sq, _, n) in a.items():
        fills[(sh, sq)] += n
        members[(sh, sq)] += 1
    for key, tot in fills.items():
        assert tot <= 16 or members[key] == 1
