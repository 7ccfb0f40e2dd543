"""Sampling operators.

Reference: /root/reference/recon/sample.py:47-94 (sample_examples:
stratified cap of top_k_per_hash examples per meta-bucket, optional
global top_k, shuffled). The reference shuffles with unseeded
random.shuffle; our distributed version replaces that with a
deterministic arithmetic permutation (Knuth multiplicative hash of the
row id) so results are reproducible across engines, partitionings and
reruns — a documented, intentional divergence (SURVEY.md §7.3.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2_654_435_761
MOD = 4_294_967_296


def shuffle_key(id_col: str = "doc_id") -> F.Column:
    """Deterministic pseudo-random ordering key: (id * K) mod 2^32."""
    return F.expr(f"({id_col} * {KNUTH}L) % {MOD}L")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k_per_stratum: int,
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """At most k rows per stratum, chosen by the deterministic shuffle
    order; optional global cap. Implemented as one window rank — a
    single shuffle on the strata column."""
    w = Window.partitionBy(strata_col).orderBy(shuffle_key(id_col), id_col)
    out = (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k_per_stratum)
        .drop("rk")
    )
    if top_k is not None:
        out = out.orderBy(shuffle_key(id_col), id_col).limit(top_k)
    return out
