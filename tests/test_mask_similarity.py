"""mask_1d (reference recon/augmentation.py:9-19) + similarity scale
paths: golden mask selection, Spark/kernel bit-equality, sub_prob span
masking, ANN recall vs the exact pair set, and the sharded BLAS path."""

import math

import pytest

from recon_spark.operators.augmentation import (
    MASK_MIX,
    MASK_MOD,
    _augment_rows,
    mask_positions,
    with_mask_1d,
)
from recon_spark.operators.sample import KNUTH
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_mask_1d_exact_ones_count():
    # reference invariant: exactly ceil(length * prob) ones
    for n, prob in [(10, 0.3), (10, 0.5), (7, 0.25), (1, 0.5), (5, 1.0), (8, 0.0), (0, 0.5)]:
        ps = mask_positions(n, prob, seed=13)
        expected = math.ceil(n * prob) if n > 0 else 0
        assert len(ps) == expected, (n, prob, ps)
        assert all(0 <= j < n for j in ps)


def test_mask_1d_golden_positions():
    # pinned against the keyed-rank spec: smallest (seed*KNUTH + j*MIX) % MOD
    n, prob, seed = 6, 0.5, 3
    keyed = sorted(
        (((seed % MASK_MOD) * KNUTH + j * MASK_MIX) % MASK_MOD, j) for j in range(n)
    )
    expected = {j for _, j in keyed[: math.ceil(n * prob)]}
    assert mask_positions(n, prob, seed) == expected
    # determinism: same inputs -> same mask
    assert mask_positions(n, prob, seed) == mask_positions(n, prob, seed)
    # different seed -> (almost surely) different selection for this golden
    assert mask_positions(n, prob, seed + 1) != expected


def test_mask_1d_prob_validation():
    with pytest.raises(ValueError):
        mask_positions(5, 1.5, 0)
    with pytest.raises(ValueError):
        mask_positions(5, -0.1, 0)


def test_with_mask_1d_matches_kernel(spark):
    # include negative and >2^33 seeds: the key reduces the seed mod
    # MASK_MOD before multiplying, so 64-bit engines never wrap and
    # pmod/% agree on the sign
    rows = [(i, 3 + (i * 7) % 9) for i in range(40)] + [
        (-17, 6),
        (-1, 5),
        (10_000_000_001, 7),
        (2**62 // 3, 8),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n int")
    out = with_mask_1d(df, "n", 0.4, seed_expr="doc_id").collect()
    for r in out:
        got = {j for j, b in enumerate(r["mask"]) if b}
        assert got == mask_positions(r["n"], 0.4, r["doc_id"])
        assert len(r["mask"]) == r["n"]


def test_ent_label_sub_sub_prob_masks_targets():
    text = "t0 xxxxxxx t1 xxxxxxx t2 xxxxxxx t3 xxxxxxx"
    spans = [
        {"text": "t0", "start": 0, "end": 2, "label": "X"},
        {"text": "t1", "start": 11, "end": 13, "label": "X"},
        {"text": "t2", "start": 22, "end": 24, "label": "X"},
        {"text": "t3", "start": 33, "end": 35, "label": "X"},
    ]
    out = _augment_rows(5, text, spans, "X", ["AA", "BB"], n_augs=1, sub_prob=0.5)
    assert len(out) == 1
    _, _, new_text, _ = out[0]
    # exactly ceil(4 * 0.5) = 2 of the four targets substituted
    n_subbed = sum(new_text.count(c) for c in ("AA", "BB"))
    assert n_subbed == 2
    keep = mask_positions(4, 0.5, 5 + 0)
    for j in range(4):
        assert (f"t{j}" not in new_text) == (j in keep)


@pytest.fixture(scope="module")
def exact_pairs(spark):
    from recon_spark.operators.similarity import cosine_neardup_pairs_blas

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    return {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs_blas(emb, threshold=0.45).collect()
    }


def test_ivf_trained_recall(spark, exact_pairs):
    from recon_spark.operators.similarity import ivf_neardup_pairs

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in ivf_neardup_pairs(emb, threshold=0.45).collect()
    }
    assert got <= exact_pairs  # precision 1.0 by construction (exact verify)
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"IVF recall {recall} < 0.8 vs {len(exact_pairs)} exact pairs"


def test_lsh_recall_reported(spark, exact_pairs):
    from recon_spark.operators.similarity import (
        cosine_neardup_pairs_blas,
        lsh_neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(emb, threshold=0.45, dim=64).collect()
    }
    assert got <= exact_pairs
    # sign-LSH recall is banded (BENCH/BASELINE.md): near-perfect in the
    # high-similarity regime it is designed for, weak in the 0.45-0.55
    # "not actually near-duplicates" band. Assert both properties.
    strong = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs_blas(emb, threshold=0.55).collect()
    }
    if strong:
        strong_recall = len(got & strong) / len(strong)
        assert strong_recall >= 0.9, f"LSH strong-band recall {strong_recall}"
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"LSH overall recall {recall}"


def test_blas_sharded_equals_unsharded(spark):
    from recon_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blas,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    one = {(r["id_a"], r["id_b"], r["cos"]) for r in
           cosine_neardup_pairs_blas(emb, threshold=0.45, n_shards=1).collect()}
    three = {(r["id_a"], r["id_b"], r["cos"]) for r in
             cosine_neardup_pairs_blas(emb, threshold=0.45, n_shards=3).collect()}
    fold = {(r["id_a"], r["id_b"], r["cos"]) for r in
            cosine_neardup_pairs(emb, threshold=0.45).collect()}
    assert one == three == fold and len(one) > 0


def test_blas_guard_raises(spark):
    from recon_spark.operators.similarity import cosine_neardup_pairs_blas

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with pytest.raises(ValueError, match="max_collect_rows"):
        cosine_neardup_pairs_blas(emb, threshold=0.45, max_collect_rows=10)


def test_connected_components_string_ids(spark):
    # ADVICE r1: the driver union-find fast path must honor non-long id
    # types the same way the distributed path does
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    from recon_spark.operators.dedupe import connected_components

    out = {(r["id"], r["component"]) for r in connected_components(pairs).collect()}
    assert out == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_cosine_topk_vectorized_equals_fold(spark):
    from pyspark.sql import functions as F

    from recon_spark.operators.similarity import cosine_topk, cosine_topk_vectorized

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    fast = [tuple(r) for r in cosine_topk_vectorized(emb, queries, k=10).collect()]
    slow = [tuple(r) for r in cosine_topk(emb, queries, k=10).collect()]
    assert fast == slow and len(fast) > 0


def test_kmeans_partitioning_independent(spark):
    """Lloyd's must produce identical centroids under any partitioning —
    the property the round-6 mean rounding buys (summation order differs
    per partitioning; rounded means must not). This is what keeps the
    Spark result bit-comparable with the single-threaded DuckDB oracle."""
    from recon_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    one = kmeans_centroids(emb.repartition(1))
    many = kmeans_centroids(emb.repartition(16))
    assert one == many and len(one) > 0


def test_kmeans_train_sample_bound(spark):
    from recon_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    full = kmeans_centroids(emb)
    # below the bound the sample IS the table
    assert kmeans_centroids(emb, max_train_rows=10_000_000) == full
    # above the bound: trains on a strided sample, still k valid centroids
    sampled = kmeans_centroids(emb, max_train_rows=50)
    # stride rounding can yield fewer than k centroids (ceil(n/stride));
    # the oracle replica uses the same formula, so this is spec, not drift
    assert 0 < len(sampled) <= len(full)
    assert all(len(cv) == len(full[0][1]) for _, cv in sampled)


def test_ent_label_sub_forwards_sub_prob(spark):
    """Regression: the DataFrame operator must forward sub_prob to the
    kernel (it was silently ignored once)."""
    from recon_spark.operators.augmentation import ent_label_sub

    text = "t0 xxxxxxx t1 xxxxxxx t2 xxxxxxx t3 xxxxxxx"
    spans = [
        {"text": f"t{j}", "start": j * 11, "end": j * 11 + 2, "label": "X",
         "token_start": 2 * j, "token_end": 2 * j, "kb_id": None, "source": None}
        for j in range(4)
    ]
    df = spark.createDataFrame(
        [(5, text, spans)],
        "doc_id long, text string, spans array<struct<text: string, start: int,"
        "end: int, label: string, token_start: int, token_end: int,"
        "kb_id: string, source: string>>",
    )
    out = ent_label_sub(df, "X", ["AA", "BB"], n_augs=1, sub_prob=0.5).collect()
    assert len(out) == 1
    n_subbed = sum(out[0]["text"].count(c) for c in ("AA", "BB"))
    expected = _augment_rows(5, text, spans, "X", ["AA", "BB"], 1, 0.5)
    assert n_subbed == 2 and out[0]["text"] == expected[0][2]


def test_cosine_topk_vectorized_tie_break(spark):
    """Many identical vectors (all pairwise cosine 1.0): the per-batch
    pre-selection must keep the smallest neighbor ids, exactly as the
    (cos DESC, neighbor_id ASC) window does."""
    from recon_spark.operators.similarity import cosine_topk, cosine_topk_vectorized

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where("vec_id = 7")
    fast = [tuple(r) for r in cosine_topk_vectorized(df, q, k=5).collect()]
    slow = [tuple(r) for r in cosine_topk(df, q, k=5).collect()]
    assert fast == slow
    assert [r[1] for r in fast] == [0, 1, 2, 3, 4]  # smallest ids win ties
