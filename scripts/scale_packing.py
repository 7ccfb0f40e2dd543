#!/usr/bin/env python
"""N->4N scaling evidence for sequence packing (round 5).

Protocol = scripts/_scale_common.py. 4M short documents (1-40 tokens,
deterministic by id) packed into capacity-512 sequences across 256
shards — one shuffle on shard, then the sequential greedy loop per
shard inside applyInPandas (an Arrow-batched Python stage, unlike the
pure-JVM ops measured elsewhere: this records how the Python-stage
pattern scales on this box).

    python scripts/scale_packing.py            # both levels + summary
    python scripts/scale_packing.py --cores N  # one level, raw JSON
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
    warm_python_workers,
)

DOCS_N = 4_000_000
CAP = 512
SHARDS = 256
N_LO, N_HI = 2, 8


def stage(n: int) -> str:
    import tempfile

    from recon_spark.session import get_spark

    staged = os.path.join(tempfile.gettempdir(), f"pack_scale_{n}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.range(0, n).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), (F.col("id") % 40 + 1).cast("int")),
                    lambda i: F.concat(F.lit("t"), i),
                ),
                " ",
            ).alias("text"),
        )
        docs.repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def run_level(cores: int) -> dict:
    from recon_spark.operators.textstats import pack_sequences
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()

    out: dict = {"cores": cores}
    staged = os.environ["RECON_SCALE_PACK_PARQUET"]
    size_splits(spark, staged)
    warm_python_workers(spark)
    docs = spark.read.parquet(staged)
    timed(out, f"pack_scan_only_x{DOCS_N}",
          lambda: docs.select("doc_id", F.length("text").alias("n")),
          "pure-JVM scan+length baseline over the staged doc parquet")
    timed(out, f"pack_sequences_x{DOCS_N}",
          lambda: pack_sequences(docs, capacity=CAP, n_shards=SHARDS),
          f"{DOCS_N:,} docs (1-40 toks) -> capacity-{CAP} sequences, "
          f"{SHARDS} shards: shuffle on shard + greedy loop per shard "
          "in applyInPandas")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_PACK_PARQUET"] = stage(DOCS_N)
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
