"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the scale path (candidates from shared sign
signatures, exact re-rank inside buckets).

Scale notes: brute force is O(Q·N·d) with the query side broadcast —
right answer when Q is small (dedupe against a blocklist, eval probes).
The LSH path bounds the candidate set per query; at 100 TB the bucketed
join shuffles only (signature, id) pairs, and signatures are computed
per-row with zero shuffle. All dot products run as JVM higher-order
aggregates over the zipped arrays (no Python).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def with_norm(df: DataFrame, vec_col: str = "embedding", out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, F.expr(_NORM.format(a=vec_col)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded):
    (query_id, neighbor_id, cos, rank). Query side is broadcast; ranking
    by unrounded cosine with neighbor-id tiebreak, cosine rounded for
    output."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    dot = _DOT.format(a="qv", b="nv")
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(f"{dot} / ({_NORM.format(a='qv')} * {_NORM.format(a='nv')})"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
        .orderBy("query_id", "rank")
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold, (id_a < id_b, cos rounded).
    Exact all-pairs (test-SF oracle baseline); use lsh_neardup_pairs at
    scale."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    dot = _DOT.format(a="va", b="vb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.expr(f"{dot} / ({_NORM.format(a='va')} * {_NORM.format(a='vb')})"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def with_lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Random-hyperplane sign signature as a BIGINT (per-row, no shuffle)."""
    planes = hyperplanes(dim, n_planes, seed)
    bits = []
    for j, p in enumerate(planes):
        arr = "array(" + ", ".join(f"{x}D" for x in p) + ")"
        dot = _DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j}L ELSE 0L END)")
    return df.withColumn(out_col, F.expr(" + ".join(bits)))


def lsh_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: block on sign-LSH signature bands, then
    exact cosine verify within buckets. Recall grows with bands; verified
    against the exact pairs in tests."""
    sig = with_lsh_signature(vectors, dim, n_planes, vec_col=vec_col)
    rows_per_band = n_planes // n_bands
    # bucketed candidate generation on (band, piece, id) ONLY — carrying
    # the d-dim float arrays through the self-join + distinct multiplies
    # shuffle bytes by ~d and makes the dedupe compare arrays (measured
    # 4x slower at sf0.1). Vectors are re-attached to the deduped id
    # pairs afterwards.
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> named_struct('b', b, "
                f"'piece', (lsh_sig div CAST(pow(2, b * {rows_per_band}) AS BIGINT)) % {1 << rows_per_band}))"
            )
        ).alias("bp"),
    ).select("id", F.col("bp.b").alias("b"), F.col("bp.piece").alias("piece"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    dot = _DOT.format(a="va", b="vb")
    return (
        pairs.withColumn(
            "cos",
            F.expr(f"{dot} / ({_NORM.format(a='va')} * {_NORM.format(a='vb')})"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


def ivf_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.45,
    centroid_every: int = 50,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flavored ANN: a deterministic coarse quantizer (every
    `centroid_every`-th vector is a centroid — the seeded-sample stand-in
    for k-means training), each vector assigned to its `nprobe` nearest
    cells (multi-probe: the standard IVF recall lever), candidate pairs
    sharing a cell, exact cosine verify on deduped id pairs. At scale
    the cell assignment is a broadcast join (centroid count ~ sqrt(N))
    and the verify join shuffles only within-cell id pairs."""
    cents = vectors.where(F.col(id_col) % centroid_every == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv")
    )
    dot = _DOT.format(a=vec_col, b="cv")
    sim = f"({dot}) / ({_NORM.format(a=vec_col)} * {_NORM.format(a='cv')})"
    assigned = (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn("__sim", F.expr(sim))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("__sim"), "cent_id")
            ),
        )
        .where(F.col("__rk") <= nprobe)
        .select(F.col(id_col).alias("id"), "cent_id")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    cand = (
        a.join(b, (F.col("a.cent_id") == F.col("b.cent_id")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pair_dot = _DOT.format(a="va", b="vb")
    pair_cos = f"({pair_dot}) / ({_NORM.format(a='va')} * {_NORM.format(a='vb')})"
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cos", F.expr(pair_cos))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


def cosine_neardup_pairs_blas(
    vectors: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 4096,
) -> DataFrame:
    """Exact all-pairs cosine via blocked BLAS: one side is collected,
    L2-normalized, and broadcast (N x d float32 — 100M vectors x 64d is
    ~25 GB, so at that scale shard the broadcast side and union); each
    Arrow batch of rows then computes a (batch x N) matmul with numpy.
    ~40x the interpreted zip_with/aggregate fold. Values can differ from
    the fold path in the last ulp (summation order), so the fold path
    (cosine_neardup_pairs) remains the oracle-pinned exact baseline;
    this is the throughput path, asserted equal after round(6) in
    tests."""
    import numpy as np

    spark = vectors.sparkSession
    rows = vectors.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def _gen(batches):
        import pandas as pd

        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            bmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(bmat):
                bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
                sims = bmat @ all_mat.T  # (batch, N)
                for i in range(len(bids)):
                    mask = (sims[i] >= threshold) & (all_ids > bids[i])
                    js = np.nonzero(mask)[0]
                    out_a.extend([int(bids[i])] * len(js))
                    out_b.extend(all_ids[js].tolist())
                    out_c.extend(np.round(sims[i][js], 6).tolist())
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos": out_c})

    out = vectors.select(id_col, vec_col).mapInPandas(
        _gen, "id_a long, id_b long, cos double"
    )
    return out.orderBy("id_a", "id_b")
