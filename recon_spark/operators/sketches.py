"""Deterministic cardinality sketch: K-Minimum-Values (KMV) distinct
counting.

At 100 TB a `COUNT(DISTINCT key)` is a full shuffle of every distinct
key; the KMV sketch answers the same question from the k smallest hash
values — a top-k that Spark executes as TakeOrderedAndProject (per-
partition heap + driver merge of k rows per partition, no shuffle of
the key set). Estimate: with h_k the k-th smallest of the distinct
hashes over a hash space of size M,  E = (k-1) * M / h_k  (the classic
bottom-k estimator; Bar-Yossef et al. 2002 / Beyer et al. 2007).

Unlike HyperLogLog (whose register layout is engine-specific and not
reproducible across engines), every step here — the multiplicative
mod-prime hash, the bottom-k, the estimator — is integer/IEEE
arithmetic that a DuckDB oracle replays exactly, so the sketch is
driver-checkable like any other query. The hash is the same universal
family ((a*x + b) mod P) the MinHash permutations use
(operators/dedupe.py); production swaps in xxhash64, the shape
(hash -> distinct -> bottom-k -> scalar) is unchanged. Keys are
numeric; hash string keys first (e.g. textstats.fingerprint)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recon_spark.operators.dedupe import P

KMV_A = 961_748_941  # same spirit as dedupe.PERM_A/B: fixed odd multipliers
KMV_B = 982_451_653


def _hash_expr(col: str) -> str:
    # key is reduced mod P BEFORE the multiply so a*x never overflows
    # int64 (|a * (x % P)| < 1e18); the outer +P %P makes the result a
    # positive residue for negative keys too. Keys that collide mod P
    # hash identically — fine for cardinalities well under P (~1e9).
    return f"(({KMV_A} * ({col} % {P}) + {KMV_B}) % {P} + {P}) % {P}"


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row frame: (k, h_k, est_distinct, n_exact, rel_err_pct).

    n_exact rides along as the quality witness (the sketch exists to
    AVOID it at scale; here it grades the estimate). When fewer than k
    distinct hashes exist the estimate falls back to the exact count —
    same branch in the oracle."""
    h = df.select(F.expr(_hash_expr(col)).alias("h")).distinct()
    bottom = h.orderBy("h").limit(k)  # TakeOrderedAndProject: scale-safe top-k
    agg = bottom.agg(F.count(F.lit(1)).alias("n_h"), F.max("h").alias("h_k"))
    exact = df.select(F.countDistinct(col).alias("n_exact"))
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(k).alias("k"),
            "h_k",
            F.when(F.col("n_h") < k, F.col("n_exact").cast("double"))
            .otherwise(
                F.round((F.lit(float(k - 1)) * F.lit(float(P))) / F.col("h_k"), 2)
            )
            .alias("est_distinct"),
            "n_exact",
        )
        .select(
            "k",
            "h_k",
            "est_distinct",
            "n_exact",
            F.round(
                (F.col("est_distinct") - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                * 100,
                2,
            ).alias("rel_err_pct"),
        )
    )


def sql_kmv_distinct(table_expr: str, col: str, k: int = 64) -> str:
    """DuckDB twin of kmv_distinct over ``table_expr``."""
    hd = _hash_expr(col)
    return f"""
WITH h AS (SELECT DISTINCT {hd} AS h FROM {table_expr}),
bottom AS (SELECT h FROM h ORDER BY h LIMIT {k}),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_h, max(h) AS h_k FROM bottom),
exact AS (SELECT CAST(count(DISTINCT {col}) AS BIGINT) AS n_exact FROM {table_expr}),
est AS (
  SELECT {k} AS k, h_k,
         CASE WHEN n_h < {k} THEN CAST(n_exact AS DOUBLE)
              ELSE round({float(k - 1)!r} * {float(P)!r} / h_k, 2) END AS est_distinct,
         n_exact
  FROM agg, exact
)
SELECT k, h_k, est_distinct, n_exact,
       round((est_distinct - n_exact) / CAST(n_exact AS DOUBLE) * 100, 2) AS rel_err_pct
FROM est
"""
