"""Scale spot-check + N->4N scaling evidence for the round-3 additions:
URL normalization, latest-capture dedup, domain stats (HLL mode),
suffix blocklist (list mode), crawl-text cleanup, DSIR resampling, and
the Arrow from_hf_dataset ingest.

Protocol = scripts/scale_new_ops.py: deterministic inputs (sf0.1
documents replicated xK with synthesized URLs/timestamps — no external
data), each op timed at two parallelism levels in FRESH JVMs
(subprocess per level so JIT/codegen caches can't leak across levels),
force() defeats column pruning, eff = (t_lo / t_hi) / (cores_hi/cores_lo).

    python scripts/scale_r3_ops.py            # both levels + BENCH append
    python scripts/scale_r3_ops.py --cores N  # one level, raw JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

MAP_X = 1000         # 5000 sf0.1 docs x1000 = 5M rows: map/agg ops need
                     # enough work that compute, not the ~1-2s per-job
                     # fixed overhead, sets the ratio (the first cut at
                     # x100 measured 4-8s totals and eff 0.39-0.64 that
                     # was pure overhead depression)
REP_X = 100          # HF ingest (Arrow kernel is ~10x heavier per row)
DSIR_X = 50          # DSIR scans grams twice (~27M gram rows at x50)
N_LO, N_HI = 2, 8


def force(df) -> int:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1000000))
        ).alias("chk"),
    ).collect()[0]
    return row["n"]


def _timed(out: dict, name: str, fn, input_desc: str) -> None:
    t0 = time.monotonic()
    try:
        n = force(fn())
        out[name] = {"sec": round(time.monotonic() - t0, 2), "rows": n,
                     "input": input_desc}
    except Exception as e:  # noqa: BLE001
        out[name] = {"sec": None, "rows": None, "input": input_desc,
                     "err": str(e).replace("\n", " ")[:300]}


def docs_with_urls(spark, x: int):
    """sf0.1 documents replicated xN with the driver queries' synthetic
    URL/timestamp scheme (queries/pipeline.py _URL_EXPR), repartitioned
    BEFORE the explode so the blow-up parallelizes."""
    from recon_spark.queries.pipeline import _URL_EXPR

    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    return (
        docs.repartition(par)
        .withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(x))))
        .select(
            (F.col("doc_id") * x + F.col("r")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .withColumns(
            {
                "url": F.expr(_URL_EXPR),
                "warc_ts_s": (F.lit(1767225600) + 37 * F.col("doc_id")).cast("long"),
            }
        )
    )


def run_ops(spark) -> dict:
    from recon_spark.io import from_hf_dataset
    from recon_spark.operators.curation import dsir_resample
    from recon_spark.operators.webops import (
        blocklist_filter,
        clean_text,
        domain_stats,
        latest_capture,
        normalize_url,
    )

    out: dict = {}
    base = docs_with_urls(spark, MAP_X)

    _timed(out, "url_normalize",
           lambda: normalize_url(base).select("doc_id", "url_norm", "host", "reg_domain"),
           f"sf0.1 docs x{MAP_X} (map-only)")
    normed = normalize_url(base)
    _timed(out, "url_latest_capture",
           lambda: latest_capture(normed, ts_col="warc_ts_s"),
           f"sf0.1 docs x{MAP_X}, {MAP_X}-way capture groups")
    _timed(out, "domain_stats_hll",
           lambda: domain_stats(normed),  # HLL mode = the production shape
           f"sf0.1 docs x{MAP_X}, approx distinct")
    _timed(out, "domain_blocklist",
           lambda: blocklist_filter(
               normed, ["site3.example.com", "site4.example.co.uk"]
           ).select("doc_id", "host"),
           f"sf0.1 docs x{MAP_X}, list mode (zero-join)")
    _timed(out, "clean_text",
           lambda: clean_text(base).select(
               "doc_id", "clean_text", "n_chars_after", "changed"),
           f"sf0.1 docs x{MAP_X} (map-only)")

    dsir_in = docs_with_urls(spark, DSIR_X).select("doc_id", "text", "source")
    _timed(out, "dsir_resample",
           lambda: dsir_resample(dsir_in, ["src0", "src1"], k=100, n_buckets=64),
           f"sf0.1 docs x{DSIR_X}, two gram passes")

    # HF ingest: tokens + synthetic IOB tags from the replicated corpus
    hf = docs_with_urls(spark, REP_X).select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.expr(
            "transform(split(text, ' '), (t, i) -> "
            "CASE WHEN length(t) >= 5 THEN (CASE WHEN i = 0 THEN 'B-LONG' "
            "ELSE 'I-LONG' END) ELSE 'O' END)"
        ).alias("tags"),
    )
    _timed(out, "hf_ingest_arrow",
           lambda: from_hf_dataset(spark, hf, tokens_col="toks", tags_col="tags")
           .select("doc_id", F.size("spans").alias("n_spans"), F.size("tokens").alias("n_toks")),
           f"sf0.1 docs x{REP_X}, Arrow engine")
    return out


def run_one_level(cores: int) -> dict:
    from recon_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale_r3_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=64,  # sized for the data, identical at both levels
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).agg(F.sum("id")).collect()  # JVM warmup
    out = run_ops(spark)
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps({"cores": cores, "ops": run_one_level(cores)}))
        return
    results = {}
    for cores in (N_LO, N_HI):
        outp = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in outp.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)["ops"]

    lines = [
        "",
        "## Round-3 operator N -> 4N scaling (same protocol as the r2 table:",
        f"fresh JVMs, shuffle_partitions=64 at both levels, force() full-eval,",
        f"local[{N_LO}] vs local[{N_HI}], loadavg_1m={os.getloadavg()[0]:.1f})",
        "",
        f"| op | input | sec @{N_LO} | sec @{N_HI} | eff {N_LO}->{N_HI} | rows |",
        "|---|---|---|---|---|---|",
    ]
    ratio = N_HI / N_LO
    for op, lo in results[N_LO].items():
        hi = results[N_HI][op]
        if lo["sec"] is None or hi["sec"] is None:
            lines.append(f"| {op} | {lo['input']} | ERR | ERR | — | — |")
            continue
        eff = round((lo["sec"] / hi["sec"]) / ratio, 3) if hi["sec"] > 0 else None
        lines.append(
            f"| {op} | {lo['input']} | {lo['sec']} | {hi['sec']} | {eff} | {hi['rows']:,} |"
        )
    lines += [
        "",
        "Identical row counts at both levels pin determinism; the",
        "Amdahl fixed term quantified above applies to the residual",
        "gap between these ratios and the host's measured 2->8 CPU",
        "ceiling (0.946). Raw JSON:",
        "",
        "```json",
        json.dumps({"cores": N_LO, "ops": results[N_LO]}),
        json.dumps({"cores": N_HI, "ops": results[N_HI]}),
        "```",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended r3 scaling table to {path}")


if __name__ == "__main__":
    main()
