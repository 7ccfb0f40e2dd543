"""Scale spot-check + N->4N scaling evidence for the round-2 additions:
PageRank, repetition metrics, as-of join, interval join, segment dedup,
triangle census, structural merge candidates.

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


def _timed(out: dict, name: str, fn, input_desc: str):
    """Per-op isolation: one op OOMing must not void the whole level's
    evidence; failures are recorded in-band."""
    t0 = time.monotonic()
    try:
        n = force(fn())
        out[name] = {
            "sec": round(time.monotonic() - t0, 2),
            "rows": n,
            "input": input_desc,
        }
    except Exception as e:  # noqa: BLE001 - record and continue
        msg = str(e).replace("\n", " ")[:300] or repr(e)[:300]
        out[name] = {"sec": None, "rows": None, "input": input_desc,
                     "err": msg}


def run_ops(spark, scale: dict) -> dict:
    from recon_spark.operators.curation import ngram_contamination
    from recon_spark.operators.dedupe import segment_dedup
    from recon_spark.operators.graph import (
        kcore,
        neighbor_merge_candidates,
        pagerank,
        random_walks,
        triangle_stats,
    )
    from recon_spark.operators.joins import asof_join, interval_join
    from recon_spark.operators.textstats import repetition_metrics

    out = {}
    par = spark.sparkContext.defaultParallelism

    edges = gen_edges(spark, scale["pr_nodes"], scale["pr_deg"])
    _timed(out, "pagerank", lambda: pagerank(edges),
           f"{scale['pr_nodes']}x{scale['pr_deg']} edges, 5 iters")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def replicated(x):
        # repartition BEFORE the explode: the source parquet is one
        # split, so exploding first would serialize the blow-up
        return (
            docs.repartition(par)
            .withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(x))))
            .select((F.col("doc_id") * x + F.col("r")).alias("doc_id"), "text")
        )

    _timed(out, "repetition_metrics",
           lambda: repetition_metrics(replicated(scale["rep_x"])),
           f"sf0.1 docs x{scale['rep_x']}")

    ev = gen_events(spark, scale["asof_events"])
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("ts_s").alias("ts"), "event_id", "value"
    )
    purchases = ev.where("event_type = 'purchase'").select(
        "event_id", "user_id", F.col("ts_s").alias("ts"), "value"
    )
    _timed(out, "asof_join",
           lambda: asof_join(purchases, clicks, on="ts", by="user_id"),
           f"{scale['asof_events']} events")

    npts, nivl = scale["rj_points"], scale["rj_intervals"]
    points = spark.range(npts).select(
        F.col("id").alias("pt_id"), ((F.col("id") * KNUTH) % 2592000).alias("p")
    )
    ivl = spark.range(nivl).select(
        F.col("id").alias("ivl_id"),
        ((F.col("id") * 7919) % 2592000).alias("s"),
    ).withColumn("e", F.col("s") + 1800 + (F.col("ivl_id") * 37) % 3600)
    _timed(out, "interval_join",
           lambda: interval_join(points, ivl, "p", "s", "e", bucket=3600),
           f"{npts} pts x {nivl} ivls")

    # xN replication = the adversarial all-dups regime (every segment
    # of every replica loses to the first copy)
    _timed(out, "segment_dedup",
           lambda: segment_dedup(replicated(scale["seg_x"])),
           f"sf0.1 docs x{scale['seg_x']}, all-dup regime")

    _timed(out, "triangle_stats",
           lambda: triangle_stats(gen_edges(spark, scale["tri_nodes"], scale["tri_deg"])),
           f"{scale['tri_nodes']}x{scale['tri_deg']} edges")

    # dst space << src space so postings are dense; max_posting=64 is
    # the designed hub cap (the scale path, not the oracle-exact path)
    mn, md, mdst = scale["mc_nodes"], scale["mc_deg"], scale["mc_dst"]
    medges = (
        spark.range(mn)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(md))).alias("j"),
        )
        .select(
            "src",
            ((F.col("src") * KNUTH + F.col("j") * 40503) % mdst).alias("dst"),
        )
    )
    _timed(out, "merge_candidates",
           lambda: neighbor_merge_candidates(medges, threshold=0.2, max_posting=64),
           f"{mn}x{md} edges into {mdst} dsts, cap 64")

    wedges = gen_edges(spark, scale["rw_nodes"], scale["rw_deg"]).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    _timed(out, "random_walks", lambda: random_walks(wedges),
           f"{scale['rw_nodes']}x{scale['rw_deg']} edges, 2 walks x 3 steps")

    _timed(out, "kcore",
           lambda: kcore(gen_edges(spark, scale["kc_nodes"], scale["kc_deg"]), k=3),
           f"{scale['kc_nodes']}x{scale['kc_deg']} edges, k=3, 4 rounds")

    # benchmark = 12-token windows of every 29th base doc; corpus = xN
    # replicated docs, so every replica of a benchmark-source doc hits
    bench = docs.where(F.col("doc_id") % 29 == 0).select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 5, 12), " ").alias("text"),
    )
    _timed(out, "ngram_contamination",
           lambda: ngram_contamination(replicated(scale["contam_x"]), bench, n=8),
           f"sf0.1 docs x{scale['contam_x']} vs every-29th benchmark")
    return out


def _scale(small: bool) -> dict:
    return (
        dict(pr_nodes=20000, pr_deg=4, rep_x=2, asof_events=100000,
             rj_points=100000, rj_intervals=1000, seg_x=2,
             tri_nodes=20000, tri_deg=4, mc_nodes=20000, mc_deg=8, mc_dst=2000,
             rw_nodes=20000, rw_deg=4, kc_nodes=20000, kc_deg=4, contam_x=2)
        if small
        else dict(pr_nodes=2000000, pr_deg=10, rep_x=400, asof_events=50000000,
                  rj_points=20000000, rj_intervals=100000, seg_x=100,
                  tri_nodes=1000000, tri_deg=10,
                  mc_nodes=1000000, mc_deg=8, mc_dst=200000,
                  rw_nodes=2000000, rw_deg=10, kc_nodes=2000000, kc_deg=6,
                  contam_x=100)
    )


def run_one_level(cores: int, scale: dict) -> dict:
    spark = get_spark(
        app_name=f"scale_new_ops_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).agg(F.sum("id")).collect()
    out = run_ops(spark, scale)
    spark.stop()
    return out


def main():
    small = "--small" in sys.argv
    # --cores N: run ONE parallelism level and print its raw timings —
    # lets a wrapper run 8 and 32 as separate processes when the
    # combined run exceeds an external wall-clock budget
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        scale = _scale(small)
        print(json.dumps({
            "cores": cores,
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "ops": run_one_level(cores, scale),
        }))
        return
    scale = _scale(small)
    results = {}
    # NOTE: shuffle partitions are sized for the DATA (64) and held
    # identical at both levels inside run_one_level: tying them to the
    # core count under-partitions the 8-core run (330M-row partitions
    # on the billion-pair join -> spill), inflating apparent scaling
    for cores in (8, 32):
        results[cores] = run_one_level(cores, scale)
    report = {"loadavg_1m": round(os.getloadavg()[0], 2), "scale": scale}
    for op in results[8]:
        t8, t32 = results[8][op]["sec"], results[32][op]["sec"]
        if t8 is None or t32 is None:
            report[op] = {
                "err": results[8][op].get("err") or results[32][op].get("err")
            }
            continue
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
