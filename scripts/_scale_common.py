"""Shared N->4N timing-protocol helpers for the scale_* scripts.

The protocol pieces that MUST stay identical for cross-script
efficiency numbers to be comparable: the xxhash force (defeats column
pruning), the timing wrapper, the Python-worker warmup, and the
input-split sizing. scale_flac.py and scale_video.py import from here;
the earlier scale scripts keep their frozen inline copies deliberately
— their published BENCH numbers were produced by those exact bytes,
and retro-editing a measurement script breaks artifact provenance.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def force(df) -> int:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1000000))
        ).alias("chk"),
    ).collect()[0]
    return row["n"]


def timed(out: dict, name: str, fn, input_desc: str) -> None:
    t0 = time.monotonic()
    try:
        n = force(fn())
        out[name] = {"sec": round(time.monotonic() - t0, 2), "rows": n,
                     "input": input_desc}
    except Exception as e:  # noqa: BLE001
        out[name] = {"sec": None, "rows": None, "input": input_desc,
                     "err": str(e).replace("\n", " ")[:300]}


def warm_python_workers(spark) -> None:
    def _ident(batches):
        for b in batches:
            yield b

    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores * 4, 1, cores).mapInArrow(_ident, "id long").count()


def size_splits(spark, staged: str) -> None:
    total = sum(
        os.path.getsize(os.path.join(staged, f))
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    )
    cores = spark.sparkContext.defaultParallelism
    tgt = max(4 * 1024 * 1024, total // (cores * 2))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))


def print_summary(levels: dict, n_lo: int, n_hi: int) -> None:
    print("\n| op | t@%d | t@%d | eff (N->4N) |" % (n_lo, n_hi))
    print("|---|---|---|---|")
    for k in levels[n_lo]:
        if k == "cores" or levels[n_lo][k].get("sec") is None:
            continue
        lo, hi = levels[n_lo][k]["sec"], levels[n_hi][k]["sec"]
        if hi:
            eff = (lo / hi) / (n_hi / n_lo)
            print(f"| {k} | {lo} | {hi} | {eff:.3f} |")
