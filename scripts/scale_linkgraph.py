"""N->4N scaling evidence for the round-5 link-graph additions:
extract_links (regexp_extract_all href harvest + higher-order
resolution against the page URL, pure JVM), the full host_link_graph
shape (harvest -> host-pair aggregate; the ONLY shuffle carries
(src_host, dst_host) pairs, never pages), extract_anchors (the
(link, anchor text) pair variant feeding alias mining), and the full
anchor_alias_dictionary shape (harvest -> (target, alias) combinable
agg -> ranking window over dictionary rows only).

Protocol = scripts/scale_r5b_ops.py: deterministic staged parquet (no
external data), each op timed at two parallelism levels in FRESH JVMs,
force() defeats column pruning, eff = (t_lo / t_hi) / (cores_hi /
cores_lo). Pages carry ~2KB of filler around 12 anchors so the input
is real-crawl-shaped, not anchor-only.

    python scripts/scale_linkgraph.py            # both levels + summary
    python scripts/scale_linkgraph.py --cores N  # one level, raw JSON
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

PAGES = 1_000_000
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


def _size_splits(spark, staged: str) -> None:
    total = sum(
        os.path.getsize(os.path.join(staged, f))
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    )
    cores = spark.sparkContext.defaultParallelism
    tgt = max(4 * 1024 * 1024, total // (cores * 2))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))


def stage_pages(n: int) -> str:
    """n pages, each ~2KB: a page URL in the 13-host family and an HTML
    body with 12 anchors exercising every resolution branch (absolute,
    protocol-relative, rooted, directory-relative, javascript: drop)
    interleaved with text filler."""
    import tempfile

    from recon_spark.session import get_spark

    staged = os.path.join(tempfile.gettempdir(), f"linkgraph_scale_{n}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        pid = F.col("id")
        filler = F.lit("<p>" + "lorem ipsum dolor sit amet " * 14 + "</p>")
        anchor_sets = []
        for j in range(3):
            k = (pid + j + 1) % 13
            anchor_sets.append(
                F.concat(
                    F.lit('<a href="https://site'), k.cast("string"),
                    F.lit(".example.com/x/"), pid.cast("string"),
                    F.lit('">a</a>'),
                    F.lit('<a href="//site'), ((k + 1) % 13).cast("string"),
                    F.lit('.example.com/y">b</a>'),
                    F.lit('<a href="/local/'), (pid % 997).cast("string"),
                    F.lit('">c</a>'),
                    F.lit('<a href="sub/'), (pid % 83).cast("string"),
                    F.lit('">d</a>'),
                    filler,
                )
            )
        html = F.concat(
            F.lit("<html><body>"), *anchor_sets,
            F.lit('<a href="javascript:void(0)">x</a></body></html>'),
        )
        url = F.concat(
            F.lit("https://site"), (pid % 13).cast("string"),
            F.lit(".example.com/dir/"), pid.cast("string"),
        )
        (
            spark.range(0, n)
            .select(url.alias("url"), html.alias("html"))
            .repartition(64)
            .write.mode("overwrite").parquet(staged)
        )
        spark.stop()
    return staged


def run_level(cores: int) -> dict:
    from recon_spark.operators.webops import extract_links
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()  # codegen warmup
    staged = os.environ["RECON_SCALE_PAGES_PARQUET"]
    _size_splits(spark, staged)
    pages = spark.read.parquet(staged)
    out: dict = {"cores": cores}
    _timed(out, "pages_scan_only",
           lambda: pages.select(F.length("html").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, "extract_links",
           lambda: extract_links(pages).select(
               "link_host", F.length("link").alias("n")),
           f"{PAGES:,} staged ~2KB pages x 12 resolvable anchors")
    _timed(out, "host_link_graph",
           lambda: extract_links(
               pages.withColumn(
                   "host", F.regexp_extract("url", r"^[a-z]+://([^/?]*)", 1))
           )
           .groupBy("host", "link_host")
           .agg(F.count(F.lit(1)).alias("n_links")),
           "harvest + host-pair aggregate (the full query shape)")
    from pyspark.sql import Window

    from recon_spark.operators.webops import extract_anchors

    _timed(out, "extract_anchors",
           lambda: extract_anchors(pages).select(
               "link_host", F.length("anchor").alias("n")),
           f"{PAGES:,} staged ~2KB pages x 12 flat-text anchors")

    def _alias_dict():
        anchors = extract_anchors(
            pages.withColumn(
                "host", F.regexp_extract("url", r"^[a-z]+://([^/?]*)", 1))
        )
        per = anchors.groupBy(
            F.col("link_host").alias("target"),
            F.lower(F.trim("anchor")).alias("alias"),
        ).agg(F.count(F.lit(1)).alias("n_mentions"),
              F.countDistinct("host").alias("n_hosts"))
        w = Window.partitionBy("target").orderBy(
            F.col("n_mentions").desc(), F.col("alias"))
        return per.withColumn("alias_rank", F.row_number().over(w))

    _timed(out, "anchor_alias_dictionary", _alias_dict,
           "harvest + (target, alias) agg + dictionary ranking window")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_PAGES_PARQUET"] = stage_pages(PAGES)
    levels = {}
    for cores in (N_LO, N_HI):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True, env=os.environ, check=True,
        )
        levels[cores] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(levels, indent=2))
    print("\n| op | t@%d | t@%d | eff (N->4N) |" % (N_LO, N_HI))
    print("|---|---|---|---|")
    for k in levels[N_LO]:
        if k == "cores" or levels[N_LO][k].get("sec") is None:
            continue
        lo, hi = levels[N_LO][k]["sec"], levels[N_HI][k]["sec"]
        if hi:
            eff = (lo / hi) / (N_HI / N_LO)
            print(f"| {k} | {lo} | {hi} | {eff:.3f} |")


if __name__ == "__main__":
    main()
