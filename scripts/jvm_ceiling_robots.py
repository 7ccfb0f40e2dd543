"""JVM-process ceiling probe for the robots gate (the HigherOrderFunction
analog of scripts/py_ceiling_media.py): the same TOTAL work — 20M staged
URLs through robots_filter — split across K INDEPENDENT single-core
JVMs (doc_id % K == i each), K=2 vs K=8. Independent processes share
the memory bus but NOT a JVM heap/GC: if K=8 finishes ~4x faster than
K=2, the sub-0.8 in-JVM 2->8 number is shared-heap GC/allocation
contention (interpreted HOF expressions allocate per row) and a real
cluster — one JVM per executor — scales like the process probe; if
K=8 does NOT speed up, the box's memory bus is the wall for this op.

    python scripts/jvm_ceiling_robots.py            # both K + summary
    python scripts/jvm_ceiling_robots.py --shard I K  # one worker
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_shard(i: int, k: int) -> None:
    from pyspark.sql import functions as F

    import scripts.scale_r5b_ops as S
    from recon_spark.operators.webops import parse_robots, robots_filter
    from recon_spark.queries.pipeline import _ROBOTS_V0, _ROBOTS_V1, _ROBOTS_V2
    from recon_spark.session import get_spark

    # pin GC/JIT pools: a "local[1]" JVM otherwise sizes ParallelGC /
    # C2 compiler threads to the 32-core HOST, so K concurrent 1-core
    # JVMs burst K*32 runtime threads and measure scheduler thrash,
    # not the operator
    spark = get_spark(
        master="local[1]", shuffle_partitions=2,
        extra_conf={
            "spark.driver.extraJavaOptions":
                "-XX:ParallelGCThreads=2 -XX:ConcGCThreads=1 -XX:CICompilerCount=2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()
    # shard by FILE so each worker scans 1/K of the data (a pmod filter
    # would make every worker scan the full corpus — scan work x K)
    staged = os.environ["RECON_SCALE_URLS_PARQUET"]
    files = sorted(
        os.path.join(staged, f) for f in os.listdir(staged)
        if f.endswith(".parquet")
    )
    urls = spark.read.parquet(*files[i::k])
    hosts = spark.range(0, 13).select(
        F.concat(F.lit("site"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.element_at(
            F.array(F.lit(_ROBOTS_V0), F.lit(_ROBOTS_V1), F.lit(_ROBOTS_V2)),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("robots_txt"),
    )
    rules = parse_robots(hosts)
    t0 = time.monotonic()
    n = S.force(robots_filter(urls, rules, "*").select(
        "doc_id", F.col("allowed").cast("int").alias("a")))
    print(json.dumps({"shard": i, "k": k,
                      "sec": round(time.monotonic() - t0, 2), "rows": n}))
    spark.stop()


def run_level(k: int) -> dict:
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--shard", str(i), str(k)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=os.environ,
        )
        for i in range(k)
    ]
    t0 = time.monotonic()
    shards = []
    for p in procs:
        out, _ = p.communicate()
        shards.append(json.loads(out.strip().splitlines()[-1]))
    wall = round(time.monotonic() - t0, 2)
    return {"k": k, "wall_sec": wall,
            "max_shard_sec": max(s["sec"] for s in shards),
            "rows": sum(s["rows"] for s in shards)}


def main() -> None:
    if "--shard" in sys.argv:
        i = int(sys.argv[sys.argv.index("--shard") + 1])
        k = int(sys.argv[sys.argv.index("--shard") + 2])
        run_shard(i, k)
        return
    import scripts.scale_r5b_ops as S

    os.environ["RECON_SCALE_URLS_PARQUET"] = S.stage_urls(S.URL_X)
    lo, hi = run_level(2), run_level(8)
    print(json.dumps({"2": lo, "8": hi}, indent=2))
    # same TOTAL work at both K; compare the slowest shard's TIMED
    # section (startup/warmup excluded) — wall_sec includes K parallel
    # JVM spin-ups and overstates contention
    print("process-level eff (same total work, K independent JVMs):",
          round(lo["max_shard_sec"] / hi["max_shard_sec"] / 4, 3))


if __name__ == "__main__":
    main()
