#!/usr/bin/env python
"""N->4N scaling evidence for the RDF interchange legs (round 5).

Protocol = scripts/_scale_common.py (staged parquet, fresh JVM per
level, xxhash force defeats pruning). 4M (subj, pred, obj, graph)
triples with adversarial literals salted in every 7th row (quotes,
backslashes, newlines, tabs — the escape chains must actually fire),
measured on both legs:

  rdf_serialize — term_iri/term_literal concat + replace chains into
                  one N-Quads line per row (map-only, codegen'd)
  rdf_parse     — pre-staged serialized lines through the anchored
                  regex + unescape chain back to typed columns

Both are plan-tested Python-free in tests/test_rdf.py; this measures
how that claim scales. Expectation: same one-box memory-bus band as
the other JVM string ops (PSL/robots/captions precedents) — real
executors each bring their own bus.

    python scripts/scale_rdf.py            # both levels + summary
    python scripts/scale_rdf.py --cores N  # one level, raw JSON
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

TRIPLES_N = 4_000_000
N_LO, N_HI = 2, 8


def stage(n: int) -> tuple[str, str]:
    """Stage (1) a triple table and (2) its serialized N-Quads lines,
    both as parquet, once per size. Every 7th row carries an
    escape-heavy literal so the replace chains do real work."""
    import tempfile

    from recon_spark.rdf import serialize_triples
    from recon_spark.session import get_spark

    t_dir = os.path.join(tempfile.gettempdir(), f"rdf_scale_t_{n}")
    l_dir = os.path.join(tempfile.gettempdir(), f"rdf_scale_l_{n}")
    if not (os.path.isdir(t_dir) and os.path.isdir(l_dir)):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        nasty = F.concat(
            F.lit('said "'), (F.col("id") % 997).cast("string"),
            F.lit('" \\ and\nmore\tafter'),
        )
        plain = F.concat(F.lit("fact token "), (F.col("id") % 9973).cast("string"))
        triples = spark.range(0, n).select(
            F.concat(F.lit("entity "), (F.col("id") % 100_000).cast("string")).alias("subj"),
            F.element_at(
                F.array(*[F.lit(p) for p in ("works_for", "located_in", "says", "founded")]),
                (F.col("id") % 4 + 1).cast("int"),
            ).alias("pred"),
            F.when(F.col("id") % 7 == 0, nasty).otherwise(plain).alias("obj"),
            F.concat(F.lit("https://ex.org/page/"), (F.col("id") % 50_000).cast("string")).alias("url"),
        )
        triples.repartition(64).write.mode("overwrite").parquet(t_dir)
        lines = serialize_triples(spark.read.parquet(t_dir), graph="url").select("line")
        lines.write.mode("overwrite").parquet(l_dir)
        spark.stop()
    return t_dir, l_dir


def run_level(cores: int) -> dict:
    from recon_spark.rdf import parse_rdf_lines, serialize_triples
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()

    out: dict = {"cores": cores}
    t_dir = os.environ["RECON_SCALE_RDF_T"]
    l_dir = os.environ["RECON_SCALE_RDF_L"]
    size_splits(spark, t_dir)
    triples = spark.read.parquet(t_dir)
    timed(out, f"rdf_scan_only_x{TRIPLES_N}",
          lambda: triples.select(F.length("subj").alias("a"), F.length("obj").alias("b")),
          "pure-JVM scan+length baseline over the staged triple parquet")
    timed(out, f"rdf_serialize_x{TRIPLES_N}",
          lambda: serialize_triples(triples, graph="url")
          .select(F.length("line").alias("n")),
          f"{TRIPLES_N:,} triples (1-in-7 escape-heavy) through "
          "term_iri/term_literal concat+replace chains to N-Quads lines")
    size_splits(spark, l_dir)
    lines = spark.read.parquet(l_dir)
    timed(out, f"rdf_parse_x{TRIPLES_N}",
          lambda: parse_rdf_lines(lines, value="line")
          .select("subj", "pred", F.length("obj_lit").alias("n"), "graph"),
          f"{TRIPLES_N:,} staged N-Quads lines through the anchored-regex "
          "parse + unescape chain")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    t_dir, l_dir = stage(TRIPLES_N)
    os.environ["RECON_SCALE_RDF_T"] = t_dir
    os.environ["RECON_SCALE_RDF_L"] = l_dir
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
