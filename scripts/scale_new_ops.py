"""Scale spot-check + N->4N scaling evidence for the round-2 additions:
PageRank, repetition metrics, as-of join, interval join.

Inputs are synthesized deterministically with spark.range (no external
data, any scale). Each operator runs at two parallelism levels
(default local[8] and local[32]) on the SAME input spec; the report
prints per-op wall seconds, rows/sec at both levels, and the scaling
efficiency  eff = (t_N / t_4N) / (cores_4N / cores_N).

    python scripts/scale_new_ops.py [--small]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recon_spark.session import get_spark

KNUTH = 2654435761


def gen_edges(spark, n_nodes: int, deg: int):
    """deg pseudo-random out-edges per node (multiplicative scatter)."""
    return (
        spark.range(n_nodes)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(deg))).alias("j"),
        )
        .select(
            "src",
            ((F.col("src") * KNUTH + F.col("j") * 40503) % n_nodes).alias("dst"),
        )
    )


def gen_events(spark, n: int):
    """Deterministic event stream: ~40% clicks, ~20% purchases."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 50000).alias("user_id"),
        ((F.col("id") * KNUTH) % 2592000).alias("ts_s"),  # 30 days of seconds
        F.when(F.col("id") % 5 < 2, "click")
        .when(F.col("id") % 5 < 3, "purchase")
        .otherwise("view")
        .alias("event_type"),
        ((F.col("id") * 7919) % 10000 / 100.0).alias("value"),
    )


def force(df) -> int:
    """Row count that FORCES full evaluation of every output column.
    A bare count() lets Catalyst prune unused window expressions and
    eliminate left joins against unique-key aggregates — i.e. skip the
    very operator being measured."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1000000))
        ).alias("chk"),  # mod before sum: ANSI mode overflows raw hash sums
    ).collect()[0]
    return row["n"]


def run_ops(spark, scale: dict) -> dict:
    from recon_spark.operators.graph import pagerank
    from recon_spark.operators.joins import asof_join, interval_join
    from recon_spark.operators.textstats import repetition_metrics

    out = {}

    # --- pagerank ---------------------------------------------------------
    edges = gen_edges(spark, scale["pr_nodes"], scale["pr_deg"])
    t0 = time.monotonic()
    n = force(pagerank(edges))
    out["pagerank"] = {
        "sec": round(time.monotonic() - t0, 2),
        "rows": n,
        "input": f"{scale['pr_nodes']}x{scale['pr_deg']} edges, 5 iters",
    }

    # --- repetition metrics ----------------------------------------------
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rep = scale["rep_x"]
    big = (
        # repartition BEFORE the explode: the source parquet is one
        # split, so exploding first would serialize the x400 blow-up
        docs.repartition(spark.sparkContext.defaultParallelism)
        .withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(rep))))
        .select((F.col("doc_id") * rep + F.col("r")).alias("doc_id"), "text")
    )
    t0 = time.monotonic()
    n = force(repetition_metrics(big))
    out["repetition_metrics"] = {
        "sec": round(time.monotonic() - t0, 2),
        "rows": n,
        "input": f"sf0.1 docs x{rep}",
    }

    # --- as-of join -------------------------------------------------------
    ev = gen_events(spark, scale["asof_events"])
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("ts_s").alias("ts"), "event_id", "value"
    )
    purchases = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", F.col("ts_s").alias("ts"), "value"
    )
    t0 = time.monotonic()
    n = force(asof_join(purchases, clicks, on="ts", by="user_id"))
    out["asof_join"] = {
        "sec": round(time.monotonic() - t0, 2),
        "rows": n,
        "input": f"{scale['asof_events']} events",
    }

    # --- interval join ----------------------------------------------------
    npts, nivl = scale["rj_points"], scale["rj_intervals"]
    points = spark.range(npts).select(
        F.col("id").alias("pt_id"), ((F.col("id") * KNUTH) % 2592000).alias("p")
    )
    ivl = spark.range(nivl).select(
        F.col("id").alias("ivl_id"),
        ((F.col("id") * 7919) % 2592000).alias("s"),
    ).withColumn("e", F.col("s") + 1800 + (F.col("ivl_id") * 37) % 3600)
    t0 = time.monotonic()
    n = force(interval_join(points, ivl, "p", "s", "e", bucket=3600))
    out["interval_join"] = {
        "sec": round(time.monotonic() - t0, 2),
        "rows": n,
        "input": f"{npts} pts x {nivl} ivls",
    }
    return out


def main():
    small = "--small" in sys.argv
    scale = (
        dict(pr_nodes=20000, pr_deg=4, rep_x=2, asof_events=100000,
             rj_points=100000, rj_intervals=1000)
        if small
        else dict(pr_nodes=2000000, pr_deg=10, rep_x=400, asof_events=50000000,
                  rj_points=20000000, rj_intervals=100000)
    )
    results = {}
    for cores in (8, 32):
        # shuffle partitions sized for the DATA, identical at both
        # levels: tying them to the core count under-partitions the
        # 8-core run (330M-row partitions on the billion-pair join ->
        # spill), which would inflate apparent scaling
        spark = get_spark(
            app_name=f"scale_new_ops_{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=64,
        )
        spark.sparkContext.setLogLevel("ERROR")
        # JVM/codegen warmup so the first timed op doesn't pay it
        spark.range(2000000).agg(F.sum("id")).collect()
        results[cores] = run_ops(spark, scale)
        spark.stop()
    report = {"loadavg_1m": round(os.getloadavg()[0], 2), "scale": scale}
    for op in results[8]:
        t8, t32 = results[8][op]["sec"], results[32][op]["sec"]
        report[op] = {
            "sec_8": t8,
            "sec_32": t32,
            "rows": results[32][op]["rows"],
            "input": results[32][op]["input"],
            "eff_8_to_32": round((t8 / t32) / 4.0, 3) if t32 > 0 else None,
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
