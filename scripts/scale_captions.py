#!/usr/bin/env python
"""N->4N scaling evidence for the JVM subtitle parsers (round 5).

Protocol = scripts/_scale_common.py (staged parquet, fresh JVM per
level, force() defeats pruning). 2M subtitle documents (SRT for even
ids, WebVTT for odd — 3 cues each, hour-scale timestamps, a two-line
caption per doc), parsed through parse_srt/parse_vtt's pure-JVM
split + regexp + epoch-ms chain into one agg. The parsers are
whole-stage-codegen scans (plan-tested Python-free in
tests/test_captions.py); this measures how that claim scales.

    python scripts/scale_captions.py            # both levels + summary
    python scripts/scale_captions.py --cores N  # one level, raw JSON
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

DOCS_N = 2_000_000
N_LO, N_HI = 2, 8


def stage_docs(n: int) -> str:
    import tempfile

    import pyarrow as pa

    from recon_spark.operators.captions import srt_text, vtt_text
    from recon_spark.session import get_spark

    staged = os.path.join(tempfile.gettempdir(), f"subs_scale_{n}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

        def _gen(batches):
            for batch in batches:
                ids = batch.column("id").to_pylist()
                docs = []
                for i in ids:
                    off = (i % 4000) * 97_000
                    cues = [
                        (off + k * 400, off + k * 400 + 300,
                         f"caption {i % 997} line one"
                         + ("\nand line two" if k == 1 else ""))
                        for k in range(3)
                    ]
                    docs.append(srt_text(cues) if i % 2 == 0
                                else vtt_text(cues))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids, pa.int64()), pa.array(docs, pa.string())],
                    ["doc_id", "srt"],
                )

        spark.range(0, n).mapInArrow(
            _gen, "doc_id long, srt string"
        ).repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def run_level(cores: int) -> dict:
    from recon_spark.operators.captions import parse_srt, parse_vtt
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()

    out: dict = {"cores": cores}
    staged = os.environ["RECON_SCALE_SUBS_PARQUET"]
    size_splits(spark, staged)
    warm_python_workers(spark)
    docs = spark.read.parquet(staged)
    timed(out, f"subs_scan_only_x{DOCS_N}",
          lambda: docs.select("doc_id", F.length("srt").alias("n")),
          "pure-JVM scan+length baseline over the same staged parquet")

    def _parse():
        even = parse_srt(docs.where(F.pmod("doc_id", F.lit(2)) == 0))
        odd = parse_vtt(docs.where(F.pmod("doc_id", F.lit(2)) == 1))
        return even.unionByName(odd).select(
            "doc_id",
            (F.col("end_ms") - F.col("start_ms")).alias("dur"),
            F.length("caption").alias("cap_len"),
        )

    timed(out, f"subs_parse_x{DOCS_N}",
          _parse,
          f"{DOCS_N:,} staged subtitle docs (SRT/VTT halves) x 3 cues "
          "through the pure-JVM split+regexp+epoch-ms chain")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_SUBS_PARQUET"] = stage_docs(DOCS_N)
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
