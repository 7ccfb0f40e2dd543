"""spark-submit entrypoint for the KG-construction pipeline.

Production launch (the BASELINE.json north_rule launch story):

    ZIP=$(python -c "from recon_spark.deploy import build_pyfiles_zip; \\
print(build_pyfiles_zip())")
    spark-submit --py-files "$ZIP" scripts/run_pipeline.py \\
        --pages /data/crawl/pages --out /data/kg/triples --parts 1024

Local / dev form (synthesizes the deterministic demo corpus):

    PYTHONPATH=. python -m recon_spark --n-pages 1000000 \\
        --out /tmp/kg --parts 256

Reads pages(url, warc_ts, html, text, lang), runs extraction →
validation → SVO triples → canonicalization → idempotent MERGE, and
prints one JSON metrics line (rows added, per-partition lineage).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="recon_spark")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="path to a pages parquet/table")
    src.add_argument("--n-pages", type=int, help="synthesize N demo pages")
    ap.add_argument("--out", required=True, help="triple store output dir")
    ap.add_argument("--parts", type=int, default=16, help="output partitions")
    ap.add_argument("--master", default=None, help="override spark master")
    args = ap.parse_args(argv)

    from recon_spark.session import get_spark
    from recon_spark.triples import build_triples

    spark = get_spark(app_name="recon_spark_pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    try:
        from recon_spark.deploy import ensure_pyfiles

        ensure_pyfiles(spark)
        if args.pages:
            pages = spark.read.parquet(args.pages)
        else:
            from recon_spark.pages import generate_pages

            pages = generate_pages(spark, args.n_pages)
        metrics = build_triples(spark, pages, args.out, n_parts=args.parts)
        print(json.dumps(metrics, default=str))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
