"""Structured Streaming ingestion: incremental crawls -> triple store.

The reference is batch-only (generators at recon/recognizer.py:111-120
are its only "stream"), but a production CC-scale pipeline ingests
crawl batches continuously. Two shapes:

1. ``stream_events_hourly`` — watermarked tumbling-window aggregation
   over an event stream (late data bounded by the watermark).
2. ``stream_pages_to_triples`` — file-source stream of page batches ->
   the same extraction stages as the batch factory -> foreachBatch
   MERGE into the SnapshotStore. Exactly-once lands on the merge key:
   replayed micro-batches insert 0 rows, so the streaming checkpoint
   plus the idempotent MERGE give end-to-end resume (same property the
   batch pipeline has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recon_spark.storage import SnapshotStore


def stream_events_hourly(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    watermark: str = "2 hours",
):
    """Streaming tumbling-window count/sum per (hour, event_type) with a
    late-data watermark. Returns the streaming DataFrame (caller picks
    sink + trigger; tests use availableNow + memory sink)."""
    src = spark.readStream.schema(schema_ddl).parquet(source_dir)
    return (
        src.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_pages_to_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_parts: int = 8,
):
    """Incremental triple factory: each arriving page file becomes a
    micro-batch through the full extraction pipeline, merged
    idempotently into the triple store. Returns the StreamingQuery
    (availableNow trigger: drain what's there, then stop)."""
    from recon_spark.pages import PAGES_DDL
    from recon_spark.triples import build_triples

    src = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_triples(spark, batch_df, out_dir, n_parts=n_parts)

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def triple_store(spark: SparkSession, out_dir: str) -> SnapshotStore:
    return SnapshotStore(spark, out_dir, key_col="triple_key", hash_col="content_hash")


def stream_user_sessions(
    spark: SparkSession,
    source_dir: str,
    gap_ms: int = 1_800_000,
    schema_ddl: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
):
    """Custom stateful streaming operator: per-user sessionization with
    applyInPandasWithState. State = the user's open session (start, last
    event ms, length) + closed-session accumulators; a new event more
    than ``gap_ms`` after the last one closes the open session. Output
    (on state completion) is one row per user: n_sessions, n_events,
    longest_session — the exact batch sessionization contract
    (queries/pipeline.py:q_events_sessions), which an availableNow drain
    must reproduce bit-for-bit (driver-checked).

    Scale shape: state is O(1) per user (5 longs); the shuffle is the
    groupBy(user_id) Spark requires for keyed state.

    This is the drain / batch-parity form: NoTimeout + a cumulative
    summary emitted per batch, which is exactly right for an
    availableNow drain (one batch, one final row per user) and verified
    against the batch oracle. A CONTINUOUS deployment must switch to
    EventTimeTimeout (state.setTimeoutTimestamp at last_ms + gap +
    watermark delay, emit-and-remove on timeout) — with NoTimeout,
    state never expires and a multi-batch run re-emits each user's
    cumulative summary every batch.

    Ordering caveat: events are sorted by (ms, event_id) WITHIN each
    micro-batch, so per-user event-time monotonicity ACROSS batches is
    assumed — an availableNow single-file drain (the driver query)
    satisfies it trivially. A continuous deployment with cross-batch
    disorder should buffer events in state and fold them when the
    watermark passes their window."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = spark.readStream.schema(schema_ddl).parquet(source_dir)
    events = (
        src.withColumn("ms", F.unix_millis(F.col("ts").cast("timestamp")))
        .withWatermark("ts", "2 hours")
        .select("user_id", "event_id", "ms")
    )

    def _sessionize(key, pdfs, state: GroupState):
        # state: (n_closed, longest_closed, open_len, open_last_ms, n_events)
        if state.exists:
            n_closed, longest, open_len, last_ms, n_events = state.get
        else:
            n_closed, longest, open_len, last_ms, n_events = 0, 0, 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ms", "event_id"])
        for ms in rows["ms"]:
            ms = int(ms)
            # n_events > 0 is the has-previous-event flag (a last_ms
            # sentinel value would misread negative epoch timestamps)
            if n_events > 0 and ms - last_ms > gap_ms:
                n_closed += 1
                longest = max(longest, open_len)
                open_len = 0
            open_len += 1
            n_events += 1
            last_ms = ms
        state.update((n_closed, longest, open_len, last_ms, n_events))
        # availableNow drain: emit the final summary including the still-
        # open session (the batch semantics); a continuous run would emit
        # on timeout instead
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_closed + (1 if open_len > 0 else 0)],
                "n_events": [n_events],
                "longest_session": [max(longest, open_len)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType="user_id long, n_sessions long, n_events long, longest_session long",
        stateStructType="n_closed long, longest long, open_len long, last_ms long, n_events long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_contamination(
    spark: SparkSession,
    source_dir: str,
    benchmark: DataFrame,
    n: int = 8,
    schema_ddl: str = (
        "doc_id long, text string, lang string, source string, n_chars long"
    ),
):
    """Streaming decontamination gate: documents arriving on the stream
    are checked against the STATIC benchmark's broadcast n-gram digest
    set (stream-static broadcast join — the supported, shuffle-free
    shape); per document the count of DISTINCT colliding n-grams is
    maintained. Returns the streaming aggregate DataFrame (complete
    output mode — one row per contaminated doc so far; tests and the
    driver query drain with availableNow into a memory sink and compare
    against the batch oracle).

    Distinctness comes from a stateful dropDuplicates on (id, digest)
    BEFORE the single aggregation — streaming disallows count(distinct)
    and chained aggregations; the dedupe-then-count rewrite is the
    standard equivalent.

    Validity bound: this shape is for BOUNDED drains (availableNow /
    one-shot backfill) only. There is no event-time watermark, so the
    dropDuplicates state and the complete-mode aggregation state grow
    with the number of distinct (doc, digest) hits seen, and complete
    mode re-emits the full result every trigger. An unbounded
    continuous deployment must instead (a) carry an ingest-timestamp
    column, (b) `withWatermark` on it and use
    `dropDuplicatesWithinWatermark` so dedup state expires, and
    (c) emit per-batch increments (update/append) into an idempotent
    MERGE sink keyed on doc_id — the same sink contract
    stream_pages_to_triples uses. The streaming twin of
    operators/curation.py:ngram_contamination.
    """
    from recon_spark.operators.curation import doc_ngrams

    src = spark.readStream.schema(schema_ddl).parquet(source_dir)
    bench = (
        doc_ngrams(benchmark, n)
        .select(F.md5("ngram").alias("g"))
        .distinct()
    )
    hits = (
        doc_ngrams(src, n)
        .select("id", F.md5("ngram").alias("g"))
        .join(F.broadcast(bench), "g")
        .dropDuplicates(["id", "g"])
    )
    return (
        hits.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_distinct_hits"))
        .select(F.col("id").alias("doc_id"), "n_distinct_hits")
    )
