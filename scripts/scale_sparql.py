#!/usr/bin/env python
"""N->4N scaling evidence for the SPARQL `<p>+` closure (round 5).

Protocol = scripts/_scale_common.py (staged parquet, fresh JVM per
level). Input: a layered DAG — 100k chains x 20 layers (1.9M edges),
so the FULL closure is exactly sum_{l=1..19} 100k*l = 19M pairs and
every iteration count is deterministic (19 rounds, diameter of the
graph). This is the join-dominated worst case for the operator: the
seeded mode (ground endpoint) is a BFS whose frontier is one chain and
measures nothing but fixed cost, so the full closure is what's timed.

Unlike the per-row string ops, each closure round is a shuffle join +
distinct + anti-join, so this measures how the ITERATIVE join pipeline
scales — the same shape as the PageRank per-iteration cost that the r2
study covered.

    python scripts/scale_sparql.py            # both levels + summary
    python scripts/scale_sparql.py --cores N  # one level, raw JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from scripts._scale_common import (  # noqa: E402
    force,
    print_summary,
    size_splits,
    timed,
)

CHAINS = 100_000
DEPTH = 20  # nodes per chain; closure = CHAINS * DEPTH*(DEPTH-1)/2 pairs
N_LO, N_HI = 2, 8


def stage(chains: int, depth: int) -> str:
    import tempfile

    from recon_spark.session import get_spark

    staged = os.path.join(
        tempfile.gettempdir(), f"sparql_scale_{chains}x{depth}"
    )
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        ids = spark.range(0, chains * (depth - 1))
        chain = (F.col("id") / (depth - 1)).cast("long")
        layer = F.col("id") % (depth - 1)
        edges = ids.select(
            F.concat(F.lit("c"), chain, F.lit("_l"), layer).alias("subj"),
            F.lit("next").alias("pred"),
            F.concat(F.lit("c"), chain, F.lit("_l"), layer + 1).alias("obj"),
        )
        edges.repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def run_level(cores: int) -> dict:
    from recon_spark.operators.sparql import compile_sparql
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()

    out: dict = {"cores": cores}
    staged = os.environ["RECON_SCALE_SPARQL_PARQUET"]
    size_splits(spark, staged)
    kg = spark.read.parquet(staged)
    timed(out, f"kg_scan_only_x{CHAINS * (DEPTH - 1)}",
          lambda: kg.select(F.length("subj").alias("n")),
          "pure-JVM scan+length baseline over the staged edge parquet")
    n_pairs = CHAINS * DEPTH * (DEPTH - 1) // 2
    timed(out, f"sparql_plus_closure_x{n_pairs}",
          lambda: compile_sparql(kg, "SELECT ?s ?o WHERE { ?s <next>+ ?o }"),
          f"full <next>+ closure over {CHAINS:,}x{DEPTH}-layer DAG: "
          f"{DEPTH - 1} join/distinct/anti-join rounds -> {n_pairs:,} pairs")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_SPARQL_PARQUET"] = stage(CHAINS, DEPTH)
    levels = {}
    for cores in (N_LO, N_HI):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True, env=os.environ, check=True,
        )
        levels[cores] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(levels, indent=2))
    print_summary(levels, N_LO, N_HI)


if __name__ == "__main__":
    main()
