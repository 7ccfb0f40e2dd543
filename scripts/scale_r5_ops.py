"""Scale spot-check + N->4N scaling evidence for the round-5 additions:
the FULL ~9.5k-rule Public Suffix List matcher (40x bigger InSet groups
than the r4 snapshot), real-crawl HTML extraction (html_to_text_v2 over
Arrow batches), and the bounded-batch WARC source (output batches
capped at 1024 records / 32MB so task memory is O(batch)).

Protocol = scripts/scale_r3_ops.py / scale_r4_ops.py: deterministic
inputs (sf0.1 documents replicated xK with the driver queries' synth
expressions — no external data), each op timed at two parallelism
levels in FRESH JVMs, force() defeats column pruning,
eff = (t_lo / t_hi) / (cores_hi / cores_lo).

    python scripts/scale_r5_ops.py            # both levels + BENCH append
    python scripts/scale_r5_ops.py --cores N  # one level, raw JSON
    python scripts/scale_r5_ops.py --html-x K [--cores N]
        # html_to_text_v2 ONLY at K-fold input (fixed-cost amortization
        # probe: the 1M-page pair leaves ~1.3s of Python-worker spin-up
        # un-amortized at 8 cores; a larger K separates fixed overhead
        # from serial fraction)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

MAP_X = 1000   # 5M rows for the map-only ops (same as r3/r4 tables)
HTML_X = 200   # 1M pages through the Python-stage extractor
WARC_X = 500   # 2.5M docs through the streamed WARC sink -> bounded source
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
        .select(
            (F.col("doc_id") * x + F.col("r")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )


def messy_pages(spark, html_x: int):
    from recon_spark.queries.pipeline import _MESSY_HEAD_UTF8

    return docs_x(spark, html_x).select(
        "doc_id",
        F.encode(
            F.concat(F.lit(_MESSY_HEAD_UTF8), F.col("text"),
                     F.lit("</p></body></html>")), "utf-8"
        ).alias("html"),
    )


def run_html_only(spark, html_x: int) -> dict:
    """html_to_text_v2 in isolation. If RECON_SCALE_HTML_PARQUET is set,
    the messy pages are read from that pre-staged parquet dir so the
    timed section is scan -> extract -> agg only; the inline-generation
    variant fuses a JVM producer (explode+concat+encode) into the same
    stage as the Python worker, which doubles memory-bus pressure per
    parallelism unit and understates the operator's own scaling."""
    from recon_spark.pages import extract_text_column_v2

    out: dict = {}
    staged = os.environ.get("RECON_SCALE_HTML_PARQUET")
    if staged:
        # NO repartition: the scan's 128MB splits (~12 for 1.5GB) already
        # exceed both parallelism levels, and a repartition would shuffle
        # the full html payload — scan -> extract -> agg stays map-only.
        pages = spark.read.parquet(staged)
        desc = f"{html_x * 5000:,} pre-staged messy pages from parquet"
    else:
        pages = messy_pages(spark, html_x)
        desc = f"sf0.1 docs x{html_x}, messy pages, Arrow batches"
    _timed(out, f"html_to_text_v2_x{html_x}",
           lambda: extract_text_column_v2(pages)
           .select("doc_id", F.length("text").alias("n")),
           desc)
    return out


def _warm_python_workers(spark) -> None:
    """Pre-fork the per-core Python workers (spark.python.worker.reuse
    keeps them alive for the timed stage). Without this, each level
    pays ~5s of fork + pyarrow/pandas import wall-clock INSIDE the
    timed section — a pure Amdahl term that is identical at @2 and @8
    and therefore reads as fake serial fraction. The JVM warmup above
    has the same rationale; this is its Python-runner twin."""
    import pyarrow as pa

    def _ident(batches):
        for b in batches:
            yield b

    cores = spark.sparkContext.defaultParallelism
    spark.range(0, cores * 4, 1, cores).mapInArrow(_ident, "id long").count()


def _size_splits(spark, staged: str) -> None:
    """Right-size scan splits for a Python map stage: target ~2 tasks
    per core. The first cut of this benchmark used fixed 8MB splits —
    56 tasks of ~200ms each — and measured eff 0.68 while the raw-
    CPython ceiling probe (scripts/py_ceiling_media.py) showed the
    HOST scaling at ~1.0 for the same bytes: the gap was 56 per-task
    Python-worker handshakes, not decode. One split per ~2/core makes
    the per-task fixed cost (~0.1s: function pickle ship + Arrow
    stream setup) noise against seconds of decode — the exact sizing
    rule a 100TB run uses (tasks of seconds-to-minutes, never ms)."""
    total = sum(
        os.path.getsize(os.path.join(staged, f))
        for f in os.listdir(staged)
        if f.endswith(".parquet")
    )
    cores = spark.sparkContext.defaultParallelism
    tgt = max(4 * 1024 * 1024, total // (cores * 2))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(tgt))
    # openCostInBytes pads each FILE at packing time; with 64 small
    # files the default 4MB padding would force ~file-per-split and
    # undo the sizing above
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))


def run_png_only(spark, png_n: int) -> dict:
    """Real PNG decode (stdlib zlib + un-filtering) in isolation: the
    genuine containers are pre-staged to parquet (RECON_SCALE_PNG_PARQUET,
    64 files so both levels have task surplus) and the timed section is
    scan -> mapInArrow decode -> agg, map-only with zero shuffle."""
    import pyarrow as pa

    from recon_spark.operators.multimodal import decode_png

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                sums.append(sum(decode_png(p)[3]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "px_sum"],
            )

    out: dict = {}
    staged = os.environ["RECON_SCALE_PNG_PARQUET"]
    _size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"png_scan_only_x{png_n}",
           lambda: media.select(
               "media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"png_decode_x{png_n}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, px_sum long"),
           f"{png_n:,} pre-staged genuine PNGs (RGB/RGBA/palette, all 5 filters)")
    return out


def run_gif_only(spark, gif_n: int) -> dict:
    """Real GIF decode (hand-rolled LZW) in isolation, same staged-
    parquet protocol as run_png_only."""
    import pyarrow as pa

    from recon_spark.operators.multimodal import decode_gif

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                sums.append(sum(decode_gif(p)[2]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "px_sum"],
            )

    out: dict = {}
    staged = os.environ["RECON_SCALE_GIF_PARQUET"]
    _size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"gif_scan_only_x{gif_n}",
           lambda: media.select(
               "media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"gif_decode_x{gif_n}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, px_sum long"),
           f"{gif_n:,} pre-staged genuine GIFs (16-color LZW, forced clears)")
    return out


def run_tiff_only(spark, tiff_n: int) -> dict:
    """Real baseline-TIFF decode (IFD walk + PackBits/TIFF-LZW +
    predictor) in isolation, same staged-parquet protocol as
    run_png_only. The staged mix is the generator's 1/3 LZW+predictor,
    1/3 PackBits, 1/3 multi-strip raw."""
    import pyarrow as pa

    from recon_spark.operators.multimodal import decode_tiff

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                sums.append(sum(decode_tiff(p)[3]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "px_sum"],
            )

    out: dict = {}
    staged = os.environ["RECON_SCALE_TIFF_PARQUET"]
    _size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"tiff_scan_only_x{tiff_n}",
           lambda: media.select(
               "media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"tiff_decode_x{tiff_n}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, px_sum long"),
           f"{tiff_n:,} pre-staged genuine TIFFs (LZW+predictor / "
           "PackBits / multi-strip raw)")
    return out


def run_jpeg_only(spark, jpeg_n: int) -> dict:
    """Real baseline-JPEG decode (Huffman entropy decode + batched
    IDCT + YCbCr inverse) in isolation, same staged-parquet protocol
    as run_png_only. The staged mix is the generator's 1/3 gray
    non-mult-of-8 / 1/3 4:4:4 color / 1/3 wide gray."""
    import pyarrow as pa

    from recon_spark.operators.multimodal import decode_jpeg

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                sums.append(sum(decode_jpeg(p)[3]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "px_sum"],
            )

    out: dict = {}
    staged = os.environ["RECON_SCALE_JPEG_PARQUET"]
    _size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"jpeg_scan_only_x{jpeg_n}",
           lambda: media.select(
               "media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"jpeg_decode_x{jpeg_n}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, px_sum long"),
           f"{jpeg_n:,} pre-staged genuine JPEGs (gray/color/wide classes)")
    return out


def run_ops(spark) -> dict:
    from recon_spark.data.psl_snapshot import PSL_RULES, full_psl_rules
    from recon_spark.operators.webops import registered_domain
    from recon_spark.pages import extract_text_column_v2
    from recon_spark.queries.pipeline import _MESSY_HEAD_UTF8, _PSL_HOST_EXPR
    from recon_spark.warc import read_warc, write_warc_files

    out: dict = {}
    base = docs_x(spark, MAP_X)

    hosts = base.withColumn("host", F.expr(_PSL_HOST_EXPR))
    _timed(out, "reg_domain_psl_full",
           lambda: registered_domain(hosts, psl=list(full_psl_rules()))
           .select("doc_id", "host", "reg_domain"),
           f"sf0.1 docs x{MAP_X}, FULL 9,506-rule PSL InSet probes (map-only)")
    _timed(out, "reg_domain_psl_snapshot",
           lambda: registered_domain(hosts, psl=list(PSL_RULES))
           .select("doc_id", "host", "reg_domain"),
           f"sf0.1 docs x{MAP_X}, 230-rule snapshot (r4 comparator)")

    pages = docs_x(spark, HTML_X).select(
        "doc_id",
        F.encode(
            F.concat(F.lit(_MESSY_HEAD_UTF8), F.col("text"),
                     F.lit("</p></body></html>")), "utf-8"
        ).alias("html"),
    )
    _timed(out, "html_to_text_v2",
           lambda: extract_text_column_v2(pages)
           .select("doc_id", F.length("text").alias("n")),
           f"sf0.1 docs x{HTML_X}, messy pages (script/style/entities), Arrow batches")

    wdocs = docs_x(spark, WARC_X).select(
        F.concat(F.lit("https://ex.org/d/"), F.col("doc_id")).alias("url"),
        (F.lit(1767225600) + F.col("doc_id")).cast("long").alias("warc_ts_s"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"),
                     F.lit("</p></body></html>")), "utf-8"
        ).alias("html"),
    )
    warc_dir = tempfile.mkdtemp(prefix="recon_scale_warc5_")
    try:
        t0 = time.monotonic()
        n_written = write_warc_files(wdocs, warc_dir).agg(
            F.sum("n_records")).collect()[0][0]
        sink_sec = round(time.monotonic() - t0, 2)
        out["warc_sink_streamed"] = {
            "sec": sink_sec, "rows": int(n_written),
            "input": f"sf0.1 docs x{WARC_X} -> streamed gzip, atomic publish"}
        _timed(out, "warc_source_bounded",
               lambda: read_warc(spark, warc_dir)
               .select("url", "warc_ts_s", F.length("html").alias("n")),
               f"{n_written:,} records, bounded 1024-rec/32MB Arrow batches")
    finally:
        shutil.rmtree(warc_dir, ignore_errors=True)
    return out


def run_one_level(cores: int, html_x: int | None = None,
                  png_n: int | None = None, gif_n: int | None = None,
                  tiff_n: int | None = None, jpeg_n: int | None = None) -> dict:
    from recon_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale_r5_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).agg(F.sum("id")).collect()  # JVM warmup
    if png_n:
        out = run_png_only(spark, png_n)
    elif gif_n:
        out = run_gif_only(spark, gif_n)
    elif tiff_n:
        out = run_tiff_only(spark, tiff_n)
    elif jpeg_n:
        out = run_jpeg_only(spark, jpeg_n)
    elif html_x:
        out = run_html_only(spark, html_x)
    else:
        out = run_ops(spark)
    spark.stop()
    return out


def _staged_media_pair(op_kind: str, n: int) -> None:
    """Stage genuine containers ONCE at full parallelism (encode is
    itself Python work; staging keeps it out of the timed section),
    settle 30s so the staging burst doesn't pollute the @2 level, then
    time the decode at both levels in fresh JVMs."""
    from recon_spark.operators.multimodal import (
        generate_media_gif,
        generate_media_jpeg,
        generate_media_png,
        generate_media_tiff,
    )
    from recon_spark.session import get_spark

    gen = {"png": generate_media_png, "gif": generate_media_gif,
           "tiff": generate_media_tiff, "jpeg": generate_media_jpeg}[op_kind]
    env_key = f"RECON_SCALE_{op_kind.upper()}_PARQUET"
    staged_dir = tempfile.mkdtemp(prefix=f"recon_scale_{op_kind}_pq_")
    spark = get_spark(app_name=f"scale_r5_{op_kind}_stage", master="local[8]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    gen(spark, n).select("media_id", "payload").repartition(64).write.mode(
        "overwrite").parquet(staged_dir)
    spark.stop()
    env = dict(os.environ, **{env_key: staged_dir})
    try:
        res = {}
        for cores in (N_LO, N_HI):
            time.sleep(30)  # settle: fresh level shouldn't inherit the
            # previous burst's scheduler/cache pressure on this noisy VM
            outp = subprocess.run(
                [sys.executable, __file__, "--cores", str(cores),
                 f"--{op_kind}-n", str(n)],
                capture_output=True, text=True, check=True, env=env,
            )
            line = [l for l in outp.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            res[cores] = json.loads(line)["ops"]
    finally:
        shutil.rmtree(staged_dir, ignore_errors=True)
    op = f"{op_kind}_decode_x{n}"
    lo, hi = res[N_LO][op], res[N_HI][op]
    eff = round((lo["sec"] / hi["sec"]) / (N_HI / N_LO), 3)
    print(json.dumps({"op": op, "lo": lo, "hi": hi, "eff": eff,
                      "loadavg_1m": round(os.getloadavg()[0], 2),
                      "all_lo": res[N_LO], "all_hi": res[N_HI]}))


def main() -> None:
    html_x = (
        int(sys.argv[sys.argv.index("--html-x") + 1])
        if "--html-x" in sys.argv else None
    )
    png_n = (
        int(sys.argv[sys.argv.index("--png-n") + 1])
        if "--png-n" in sys.argv else None
    )
    gif_n = (
        int(sys.argv[sys.argv.index("--gif-n") + 1])
        if "--gif-n" in sys.argv else None
    )
    tiff_n = (
        int(sys.argv[sys.argv.index("--tiff-n") + 1])
        if "--tiff-n" in sys.argv else None
    )
    jpeg_n = (
        int(sys.argv[sys.argv.index("--jpeg-n") + 1])
        if "--jpeg-n" in sys.argv else None
    )
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps({"cores": cores,
                          "ops": run_one_level(cores, html_x, png_n, gif_n,
                                               tiff_n, jpeg_n)}))
        return
    if png_n:
        _staged_media_pair("png", png_n)
        return
    if gif_n:
        _staged_media_pair("gif", gif_n)
        return
    if tiff_n:
        _staged_media_pair("tiff", tiff_n)
        return
    if jpeg_n:
        _staged_media_pair("jpeg", jpeg_n)
        return
    if html_x:
        env = dict(os.environ)
        staged_dir = None
        if "--staged" in sys.argv:
            # stage the messy pages to parquet ONCE (at full parallelism),
            # then time scan->extract->agg at each level
            from recon_spark.session import get_spark

            staged_dir = tempfile.mkdtemp(prefix="recon_scale_html_pq_")
            spark = get_spark(app_name="scale_r5_stage", master="local[8]",
                              shuffle_partitions=64)
            spark.sparkContext.setLogLevel("ERROR")
            messy_pages(spark, html_x).write.mode("overwrite").parquet(staged_dir)
            spark.stop()
            env["RECON_SCALE_HTML_PARQUET"] = staged_dir
        try:
            res = {}
            for cores in (N_LO, N_HI):
                outp = subprocess.run(
                    [sys.executable, __file__, "--cores", str(cores),
                     "--html-x", str(html_x)],
                    capture_output=True, text=True, check=True, env=env,
                )
                line = [l for l in outp.stdout.strip().splitlines()
                        if l.startswith("{")][-1]
                res[cores] = json.loads(line)["ops"]
        finally:
            if staged_dir:
                shutil.rmtree(staged_dir, ignore_errors=True)
        op = f"html_to_text_v2_x{html_x}"
        lo, hi = res[N_LO][op], res[N_HI][op]
        eff = round((lo["sec"] / hi["sec"]) / (N_HI / N_LO), 3)
        print(json.dumps({"op": op, "staged": bool(staged_dir),
                          "lo": lo, "hi": hi, "eff": eff}))
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
        "## Round-5 operator N -> 4N scaling (same protocol as the r2-r4",
        "tables: fresh JVMs, shuffle_partitions=64 at both levels, force()",
        f"full-eval, local[{N_LO}] vs local[{N_HI}], "
        f"loadavg_1m={os.getloadavg()[0]:.1f})",
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
        "reg_domain_psl_full vs _snapshot is the r4 verdict's asked-for",
        "proof: the 40x rule-count growth stays an InSet hash probe per",
        "label-count group (cost is per-GROUP, not per-rule), so the",
        "full list adds the extra label-count groups' probes and nothing",
        "else. warc_sink's lower ratio includes the serial gzip of larger",
        "per-partition files at 2 cores vs 8 (same note as the r4 table).",
        "",
        "```json",
        json.dumps({"cores": N_LO, "ops": results[N_LO]}),
        json.dumps({"cores": N_HI, "ops": results[N_HI]}),
        "```",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended r5 scaling table to {path}")


if __name__ == "__main__":
    main()
