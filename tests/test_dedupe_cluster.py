"""Connected-components dedup clustering vs a driver-side union-find."""

from recon_spark.operators.dedupe import (
    connected_components,
    dedupe_corpus,
    jaccard_pairs,
    minhash_lsh_candidates,
)
from tests.conftest import SF_SMOKE


def union_find(pairs):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min element of each set
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (30, 31), (31, 32), (3, 10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    want = union_find(edges)
    assert got == want
    assert got[11] == 1  # chain 1-2-3-10-11 collapses to min id


def test_dedupe_corpus_on_planted_neardups(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = jaccard_pairs(docs, threshold=0.5)
    pair_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    kept = dedupe_corpus(docs, pairs)
    uf = union_find(pair_list)
    losers = {x for x, root in uf.items() if root != x}
    assert kept.count() == docs.count() - len(losers)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert not (kept_ids & losers)


def test_lsh_candidates_cover_jaccard_pairs(spark):
    """MinHash-LSH recall check: every true near-dup pair (Jaccard >= .5)
    must appear among the LSH candidates on the planted corpus."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    true_pairs = {
        (r["id_a"], r["id_b"]) for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    cand = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()
    }
    assert true_pairs <= cand


def test_blas_allpairs_matches_fold_path(spark):
    """The BLAS-blocked exact all-pairs must agree with the oracle-pinned
    expression fold (same pair set, cosines within rounding)."""
    from recon_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blas,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {(r.id_a, r.id_b, round(r.cos, 5)) for r in cosine_neardup_pairs(emb, threshold=0.45).collect()}
    b = {(r.id_a, r.id_b, round(r.cos, 5)) for r in cosine_neardup_pairs_blas(emb, threshold=0.45).collect()}
    assert a == b


def test_simhash_vectorized_equals_jvm(spark):
    from recon_spark.operators.dedupe import simhash32, simhash32_vectorized

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    short = spark.createDataFrame([(9001, "one two")], "doc_id long, text string")
    both = docs.select("doc_id", "text").unionByName(short)
    a = {r["id"]: r["simhash"] for r in simhash32_vectorized(both).collect()}
    b = {r["id"]: r["simhash"] for r in simhash32(both).collect()}
    assert a == b and a[9001] == 0 and len(a) > 1


def test_scratch_reliable_mode_same_results_and_releasable(spark):
    """RECON_RELIABLE_SCRATCH=1 switches scratch() pins from
    localCheckpoint to persist(MEMORY_AND_DISK) (lineage kept for
    executor-loss recovery on real clusters). Same results, and the
    caller-side release contract (clearCache) leaves nothing pinned."""
    import os

    from recon_spark.operators.dedupe import connected_components

    import gc
    import time

    pairs = spark.createDataFrame(
        # > driver threshold would need thousands of rows; force the
        # distributed label-propagation path via the threshold param
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "id_a long, id_b long"
    )
    base = sorted(map(tuple, connected_components(pairs, driver_threshold=0).collect()))
    os.environ["RECON_RELIABLE_SCRATCH"] = "1"
    try:
        rel = sorted(
            map(tuple, connected_components(pairs, driver_threshold=0).collect())
        )
    finally:
        os.environ.pop("RECON_RELIABLE_SCRATCH", None)
    assert rel == base == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
                           (20, 20), (21, 20), (22, 20)]
    # caller-side release contract: clearCache drops the CacheManager
    # pins (reliable mode); default-mode localCheckpoint blocks release
    # via GC — poll like the registry sweep does
    spark.catalog.clearCache()
    deadline = time.time() + 60
    stored = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    while stored and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        stored = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    assert len(stored) == 0, [str(s) for s in stored]
