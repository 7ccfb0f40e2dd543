"""Multi-micro-batch behavior of the UNBOUNDED decontamination gate
(streaming.stream_contamination_continuous): cross-batch duplicate
(doc, digest) hits must count once, windows seal exactly once when the
watermark passes, and nothing re-emits. Protocol mirrors
test_stream_sessions_continuous (one file per micro-batch via distinct
mtimes + maxFilesPerTrigger=1, sentinel advances the watermark)."""

from __future__ import annotations

import os
import time
import uuid

BASE_S = 1_767_225_600  # 2026-01-01T00:00:00Z, hour-aligned epoch seconds

# 3-gram vocabulary: the benchmark holds exactly one trigram
BENCH_TEXT = "alpha beta gamma"
N = 3


def _write_batch(spark, path: str, rows: list[tuple[int, str, int]]) -> None:
    """rows: (doc_id, text, ingest_offset_s) -> one parquet file."""
    df = spark.createDataFrame(
        [(did, text, "en", "src", len(text)) for did, text, _ in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from pyspark.sql import functions as F

    off = {did: o for did, _, o in rows}
    m = F.create_map(*[F.lit(x) for kv in off.items() for x in kv])
    df = df.withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(BASE_S) + m[F.col("doc_id")])
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _drain(spark, tmp_path, batches) -> list:
    from recon_spark.streaming import stream_contamination_continuous

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = str(tmp_path / f"stage{i}")
        _write_batch(spark, p, rows)
        part = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = f"{src}/batch-{i}.parquet"
        os.rename(f"{p}/{part}", dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    bench = spark.createDataFrame([(0, BENCH_TEXT)], "doc_id long, text string")
    sdf = stream_contamination_continuous(
        spark, src, bench, n=N, watermark="1 hour", window="1 hour"
    )
    name = "contc_" + uuid.uuid4().hex[:8]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def test_cross_batch_duplicate_digest_counts_once(spark, tmp_path):
    """Doc 1's contaminated trigram arrives in batch 0 AND again (same
    doc re-delivered, e.g. an at-least-once upstream) in batch 1 within
    the watermark: dropDuplicatesWithinWatermark must keep one copy, so
    n_distinct_hits stays 1; doc 2 has two DISTINCT benchmark hits? —
    the benchmark holds a single trigram, so every contaminated doc
    counts exactly its distinct overlap (here: 1)."""
    hit = f"x {BENCH_TEXT} y"  # contains the benchmark trigram once
    batches = [
        [(1, hit, 10)],
        [(1, hit, 10), (2, hit, 20), (3, "clean text entirely here", 30)],
        # sentinel: watermark -> BASE + 10h - 1h, seals the first hour
        [(99, "zz", 36_000)],
    ]
    rows = _drain(spark, tmp_path, batches)
    got = {(r.doc_id, r.window_start_s, r.n_distinct_hits) for r in rows}
    assert got == {
        (1, BASE_S, 1),
        (2, BASE_S, 1),
    }
    # exactly-once: no duplicate emissions across batches
    assert len(rows) == len(got)


def test_unsealed_window_does_not_emit(spark, tmp_path):
    """A contaminated doc whose ingest window the final watermark has
    NOT passed stays in state (correct append-mode behavior for an
    unbounded stream) — the bounded-drain caveat the operator docstring
    states, made visible."""
    hit = f"x {BENCH_TEXT} y"
    batches = [
        [(1, hit, 10)],
        # sentinel only 90 minutes ahead: watermark = 90m - 60m = 30m,
        # window [0, 1h) not yet sealed
        [(99, "zz", 5_400)],
    ]
    rows = _drain(spark, tmp_path, batches)
    assert rows == []
