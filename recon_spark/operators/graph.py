"""Graph analytics over the materialized (subj, pred, obj) table:
PageRank-style entity salience and degree statistics.

The reference's insight layer ranks entities by raw mention counts
(recon/stats.py get_entity_coverage, recon/insights.py); a knowledge
graph built at Common-Crawl scale additionally needs *link-structure*
salience — which entities the graph itself points at — to prioritize
canonicalization review and linker-dictionary curation. PageRank over
the canonical edge set is the standard answer.

Scale design (1000-executor reading 100 TB of triples):
- the edge set is distinct (src, dst) pairs, pre-joined ONCE with
  out-degree and persisted: every iteration reuses the same shuffle
  partitioning on src (one hash exchange per iteration for the
  groupBy(dst), nothing else moves).
- ranks is |V| rows — orders of magnitude smaller than |E| — so the
  per-iteration rank join is broadcast-able; Spark's AQE picks the
  broadcast side at runtime from the measured size.
- dangling mass is a 1-row aggregate crossed back in (broadcast
  nested-loop of a single row), not a driver collect.
- iteration count is FIXED (default 5) and every stored rank is
  rounded to 6 decimals, so the computation is deterministic and
  bit-reproducible in ANSI SQL (same unrolled-CTE technique as the
  trained k-means quantizer in operators/similarity.py).

Iterations use DataFrame lineage, not checkpoints: 5 fixed iterations
keep the plan shallow. For deep iteration counts, localCheckpoint each
K rounds (same pattern as dedupe.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERATIONS = 5
PR_ROUND = 6


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = PR_ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """PageRank over the directed graph of distinct (src, dst) edges
    (self-loops dropped). Returns (entity, rank) with rank rounded to
    6 decimals after every iteration — the rounding is part of the
    spec so the DuckDB oracle reproduces values exactly.

    rank_0 = round(1/N, 6)
    rank_{t+1}(u) = round((1-d)/N + d*(sum_in contrib + dangling/N), 6)

    where contrib(v->u) = rank_t(v)/out_deg(v) and dangling is the
    total rank on nodes with no out-edges (redistributed uniformly).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # single scalar action; |V| is a long, not data
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)).select(
            F.col("node").alias("entity"), "rank"
        )
    outd = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("od"))
    # pre-join contribution weights once; every iteration reuses this frame
    contrib_e = e.join(outd, "src").persist()
    dangling_nodes = nodes.join(
        outd, nodes.node == outd.src, "left_anti"
    ).persist()

    ranks = nodes.withColumn("rank", F.lit(round(1.0 / n, PR_ROUND)))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            contrib_e.join(ranks, contrib_e.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("od")).alias("contrib"))
        )
        dm = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(dm)  # 1-row broadcast, not a driver collect
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("dm") / F.lit(float(n))),
                    PR_ROUND,
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("node").alias("entity"), "rank").orderBy(
        F.desc("rank"), "entity"
    )


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree histogram over the distinct-edge graph: for each total
    degree (in + out, self-loops dropped), how many entities have it.
    The KG-quality profile: a healthy extraction shows a long-tailed
    histogram; a bugged linker collapses everything into one hub.

    One explode-free union + two aggregations; both shuffles are on
    short keys with map-side partial aggregation."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    ends = e.select(F.col("src").alias("node")).unionAll(
        e.select(F.col("dst").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_entities"))
        .orderBy("degree")
    )
