"""N->4N scaling evidence for the round-5b crawl-ops additions:
the robots.txt gate (broadcast rules array + higher-order regex winner
pick, pure JVM), sitemap parsing (native from_xml + HOF transforms,
pure JVM), and G.711 expansion (Python mapInArrow over staged WAV
containers).

Protocol = scripts/scale_r5_ops.py: deterministic inputs (sf0.1
documents replicated xK with the driver queries' synth expressions —
no external data), each op timed at two parallelism levels in FRESH
JVMs, force() defeats column pruning,
eff = (t_lo / t_hi) / (cores_hi / cores_lo).

    python scripts/scale_r5b_ops.py            # both levels + summary
    python scripts/scale_r5b_ops.py --cores N  # one level, raw JSON
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

# sized so each op runs 15s+ at 2 cores: the first cut used 5M/300k
# inputs whose 2-4s timings were dominated by per-job fixed cost (even
# the pure scan+length baselines read eff ~0.35), understating the
# operators' own scaling
URL_X = 4000      # 20M URLs through the robots gate (pure JVM)
SITEMAP_X = 240   # 1.2M sitemap bodies x 3 entries through from_xml
G711_N = 150_000  # staged G.711 tracks of 2500 samples each
G711_SAMPLES = 2500
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


def docs_x(spark, x: int):
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    return (
        docs.repartition(par)
        .withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(x))))
        .select((F.col("doc_id") * x + F.col("r")).alias("doc_id"), "n_chars")
    )


def urls_x(spark, x: int):
    """5M synthetic (host, path) pairs using the robots_gate query's
    own host/path families (13 siteK hosts x 5 path shapes)."""
    base = docs_x(spark, x)
    return base.select(
        "doc_id",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 13).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.element_at(
            F.array(
                F.concat(F.lit("/a/"), (F.col("doc_id") % 977).cast("string")),
                F.concat(F.lit("/login/"), (F.col("doc_id") % 97).cast("string")),
                F.concat(F.lit("/api/"), (F.col("doc_id") % 37).cast("string")),
                F.concat(F.lit("/p/"), (F.col("doc_id") % 53).cast("string")),
                F.lit("/"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ).alias("path"),
    )


def run_robots(spark, x: int) -> dict:
    """Timed section is scan -> gate -> agg over PRE-STAGED parquet:
    the first cut synthesized the 20M URL strings inside the timed
    stage, and the explode+concat string materialization is memory-
    bus-bound on one box (even the scan+length baseline read eff
    ~0.52) — the same lesson the media-decode protocol already
    recorded. Staging separates the operator's scaling from the
    generator's."""
    from recon_spark.operators.webops import parse_robots, robots_filter
    from recon_spark.queries.pipeline import _ROBOTS_V0, _ROBOTS_V1, _ROBOTS_V2

    staged = os.environ["RECON_SCALE_URLS_PARQUET"]
    _size_splits(spark, staged)
    urls = spark.read.parquet(staged)
    hosts = spark.range(0, 13).select(
        F.concat(F.lit("site"), F.col("id").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.element_at(
            F.array(F.lit(_ROBOTS_V0), F.lit(_ROBOTS_V1), F.lit(_ROBOTS_V2)),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("robots_txt"),
    )
    rules = parse_robots(hosts)
    out: dict = {}
    _timed(out, f"robots_scan_only_x{x}",
           lambda: urls.select("doc_id", F.length("path").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"robots_gate_x{x}",
           lambda: robots_filter(urls, rules, "*").select(
               "doc_id", F.col("allowed").cast("int").alias("a")),
           f"{x * 5000:,} staged URLs, 13 hosts x 3 robots variants, "
           "prefix fast path + HOF winner")
    return out


def run_sitemaps(spark, x: int) -> dict:
    from recon_spark.operators.webops import parse_sitemaps

    staged = os.environ["RECON_SCALE_SITEMAP_PARQUET"]
    _size_splits(spark, staged)
    bodies = spark.read.parquet(staged)
    out: dict = {}
    _timed(out, f"sitemap_scan_only_x{x}",
           lambda: bodies.select("host_id", F.length("body").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"sitemap_parse_x{x}",
           lambda: parse_sitemaps(bodies, key_col="host_id").select(
               "host_id", F.length("loc").alias("n")),
           f"{x * 5000:,} staged sitemap bodies x 3 entries through from_xml")
    return out


def stage_urls(x: int) -> str:
    import tempfile

    from recon_spark.session import get_spark

    staged = os.path.join(tempfile.gettempdir(), f"urls_scale_x{x}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        urls_x(spark, x).repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def stage_sitemaps(x: int) -> str:
    import tempfile

    from recon_spark.session import get_spark

    staged = os.path.join(tempfile.gettempdir(), f"sitemaps_scale_x{x}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        base = docs_x(spark, x)
        bodies = base.select(
            F.col("doc_id").alias("host_id"),
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.lit("<url><loc>https://h/p/"),
                (F.col("doc_id") % 997).cast("string"),
                F.lit("?a=1&amp;b=2</loc><lastmod>2026-01-02</lastmod></url>"),
                F.lit("<url><loc>  https://h/q/"),
                (F.col("doc_id") % 83).cast("string"),
                F.lit("  </loc></url>"),
                F.lit("<url><loc>https://h/r</loc></url></urlset>"),
            ).alias("body"),
        )
        bodies.repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def _warm_python_workers(spark) -> None:
    def _ident(batches):
        for b in batches:
            yield b

    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores * 4, 1, cores).mapInArrow(_ident, "id long").count()


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


def run_g711(spark, n: int) -> dict:
    import pyarrow as pa

    from recon_spark.operators.multimodal import decode_wav

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                sums.append(sum(abs(s) for s in decode_wav(p)[1]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "abs_sum"],
            )

    out: dict = {}
    staged = os.environ["RECON_SCALE_G711_PARQUET"]
    _size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"g711_scan_only_x{n}",
           lambda: media.select("media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"g711_decode_x{n}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, abs_sum long"),
           f"{n:,} pre-staged genuine G.711 WAVs (ulaw/alaw mix)")
    return out


def run_level(cores: int) -> dict:
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup outside the timed sections
    spark.range(0, 1000).selectExpr("sum(id)").collect()
    out: dict = {"cores": cores}
    out.update(run_robots(spark, URL_X))
    out.update(run_sitemaps(spark, SITEMAP_X))
    out.update(run_g711(spark, G711_N))
    spark.stop()
    return out


def stage_g711(n: int) -> str:
    """Stage n G.711 containers of G711_SAMPLES companded bytes each
    (the query generator's 40-72-sample clips are too small to time the
    expansion — per-batch Python overhead dominates), once, shared by
    both levels."""
    import hashlib
    import tempfile

    import pyarrow as pa

    from recon_spark.operators.multimodal import encode_wav_g711
    from recon_spark.session import get_spark

    staged = os.path.join(
        tempfile.gettempdir(), f"g711_scale_{n}x{G711_SAMPLES}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

        def _gen(batches):
            for batch in batches:
                ids = batch.column("id").to_pylist()
                payloads = []
                for i in ids:
                    d = hashlib.sha256(f"g711:{i}".encode()).digest()
                    data = (d * (G711_SAMPLES // 32 + 1))[:G711_SAMPLES]
                    payloads.append(
                        encode_wav_g711(8000, data,
                                        "ulaw" if i % 2 == 0 else "alaw"))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
                    ["media_id", "payload"],
                )

        spark.range(0, n).mapInArrow(
            _gen, "media_id long, payload binary"
        ).repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_G711_PARQUET"] = stage_g711(G711_N)
    os.environ["RECON_SCALE_URLS_PARQUET"] = stage_urls(URL_X)
    os.environ["RECON_SCALE_SITEMAP_PARQUET"] = stage_sitemaps(SITEMAP_X)
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
