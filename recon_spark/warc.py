"""WARC source/sink: Common Crawl's native container format.

The reference ingests annotation files from disk (recon/loaders.py); the
web-scale analog of "the raw input format users actually have" is WARC —
every Common Crawl snapshot is ~64k ``.warc.gz`` files of ~1GB each.
This module closes the loop from raw crawl bytes to the pages table
(url, warc_ts, html, ...) that the extraction pipeline (pages.py,
triples.py) consumes.

Scale design (10^12 pages, 1000 executors):
- ``read_warc`` uses Spark's binaryFile source: ONE TASK PER WARC FILE,
  which is exactly Common Crawl's distribution unit — the files are
  sized (~1GB) so that file-granular parallelism saturates a cluster,
  and gzip makes intra-file splits impossible anyway. Record parsing is
  an Arrow-batched generator (mapInArrow): bytes never cross a
  row-at-a-time Python boundary, and the parser streams record-by-
  record so peak memory is one decompressed file per task (CC sizes
  files to make that safe).
- Multi-member gzip (Common Crawl compresses each record as its own
  gzip member so HTTP range readers can seek): handled — Python's
  zlib/gzip decompresses concatenated members transparently.
- ``write_warc_files`` is the distributed sink: one ``.warc.gz`` file
  per partition, STREAMED executor-side record-at-a-time through a
  GzipFile (peak memory = one record, never the partition), written to
  an attempt-scoped temp path and atomically renamed on success so
  speculative/zombie task attempts cannot interleave into a corrupt
  final file. Returns a manifest DataFrame (path, n_records, n_bytes)
  instead of collecting anything to the driver. Partition the input by
  the intended file key first (repartition(N) / bucketing) — the sink
  writes what it is handed.

Record format written: WARC/1.0 ``resource`` records (Content-Type:
text/html, WARC-Target-URI, WARC-Date) preceded by one ``warcinfo``
record per file, CRLF framing and the double-CRLF record separator per
the ISO 28500 spec. The reader accepts response records too (Common
Crawl's type for fetched pages) and skips other types.
"""

from __future__ import annotations

import gzip
import os
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

READ_WARC_DDL = (
    "warc_file string, rec_type string, url string, warc_ts_s long, "
    "content_type string, html binary"
)


def _format_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode() + _CRLF
    head += f"Content-Length: {len(payload)}".encode() + _CRLF
    return head + _CRLF + payload + _SEP


def _warc_date(epoch_s: int) -> str:
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _parse_warc_date(s: str) -> int:
    # WARC/1.1 allows fractional seconds; truncate to whole seconds
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return int(
        datetime.strptime(s, fmt).replace(tzinfo=timezone.utc).timestamp()
    )


def serialize_warc_records(
    records, file_id: str, record_type: str = "resource"
) -> Iterator[bytes]:
    """Stream (url, epoch_s, payload[, content_type]) records as
    WARC/1.0 framed bytes — one chunk per record, warcinfo first.
    content_type defaults to text/html; real crawls mix types (pages,
    images, robots.txt), so the sink can carry any. record_type
    "conversion" is the WET shape (extracted plain text derived from a
    capture — Common Crawl's *.warc.wet.gz files). Generator so the
    sink can write record-at-a-time with O(1 record) memory;
    deterministic: record ids derive from the file id + position, no
    clock or uuid."""
    info_payload = b"software: recon_spark\r\nformat: WARC File Format 1.0\r\n"
    yield _format_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:recon:{file_id}:info>"),
            ("WARC-Date", _warc_date(0)),
            ("Content-Type", "application/warc-fields"),
        ],
        info_payload,
    )
    for i, rec in enumerate(records):
        url, ts_s, html = rec[0], rec[1], rec[2]
        ctype = rec[3] if len(rec) > 3 and rec[3] is not None else "text/html"
        yield _format_record(
            [
                ("WARC-Type", record_type),
                ("WARC-Record-ID", f"<urn:recon:{file_id}:{i}>"),
                ("WARC-Date", _warc_date(ts_s)),
                ("WARC-Target-URI", url),
                ("Content-Type", ctype),
            ],
            html,
        )


def serialize_warc(records: list[tuple[str, int, bytes]], file_id: str) -> bytes:
    """Whole-buffer convenience wrapper over serialize_warc_records
    (tests / small fixtures; the sink streams instead)."""
    return b"".join(serialize_warc_records(records, file_id))


def _gunzip_chunks(data: bytes, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Incrementally decompress (possibly multi-member) gzip bytes —
    Common Crawl writes one member per record, so member-at-a-time
    chaining via decompressobj.unused_data keeps the decompressed
    working set at ~one record instead of the whole ~5GB file."""
    import zlib

    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # one gzip member
        while not d.eof:
            # max_length caps each inflate to `chunk` OUTPUT bytes:
            # without it, one highly-compressible input block (zeros
            # compress ~1000:1) inflates whole in a single call and
            # the "bounded" path silently holds tens of MB. Unconsumed
            # input waits in unconsumed_tail for the next iteration.
            if d.unconsumed_tail:
                out = d.decompress(d.unconsumed_tail, chunk)
            else:
                if pos >= n:
                    raise ValueError("truncated gzip member in WARC input")
                block = data[pos : pos + chunk]
                pos += len(block)
                out = d.decompress(block, chunk)
            if out:
                yield out
        # member done: unused_data is the unconsumed suffix of what we
        # fed — rewind to it, i.e. to the start of the next member
        pos -= len(d.unused_data)
        tail = d.flush()
        if tail:
            yield tail


def parse_warc_stream(
    chunks: Iterator[bytes],
) -> Iterator[tuple[str, str, int, str, bytes]]:
    """Incremental WARC record parser: consumes byte chunks, yields
    (rec_type, url, ts_s, content_type, payload) as each record
    completes. Peak memory = the current record + one input chunk — the
    shape that holds when a task parses a ~1GB .warc.gz that inflates
    to ~5GB (decompressing whole-file first would hold all of it).
    Header names are case-insensitive per spec; payload length comes
    from Content-Length exactly (payloads contain blank lines/CRLFs)."""
    buf = bytearray()
    done = False
    it = iter(chunks)
    while True:
        # parse as many complete records as the buffer holds
        pos = 0
        while True:
            while buf.startswith(_CRLF, pos):
                pos += 2
            head_end = buf.find(_SEP, pos)
            if head_end == -1:
                if done and pos < len(buf):
                    raise ValueError(
                        f"unterminated WARC header block at byte {pos}"
                    )
                break
            head = bytes(buf[pos:head_end]).decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(
                    f"missing WARC version line at byte {pos}: {lines[0]!r}"
                )
            headers: dict[str, str] = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            if "content-length" not in headers:
                raise ValueError(
                    f"record at byte {pos} has no Content-Length header"
                )
            clen = int(headers["content-length"])
            body_start = head_end + len(_SEP)
            if len(buf) - body_start < clen:
                if done:
                    raise ValueError(
                        f"truncated record: expected {clen} payload bytes, "
                        f"got {len(buf) - body_start}"
                    )
                break  # need more chunks for this payload
            payload = bytes(buf[body_start : body_start + clen])
            yield (
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                _parse_warc_date(headers["warc-date"])
                if "warc-date" in headers
                else 0,
                headers.get("content-type", ""),
                payload,
            )
            pos = body_start + clen
        del buf[:pos]  # drop consumed bytes; keep the partial tail
        if done:
            if not buf:
                return
            continue  # a final parse pass after the last chunk
        nxt = next(it, None)
        if nxt is None:
            done = True
        else:
            buf += nxt


def parse_warc(data: bytes) -> Iterator[tuple[str, str, int, str, bytes]]:
    """Stream (rec_type, url, ts_s, content_type, payload) from WARC
    bytes. Accepts gzip input (single- or multi-member — Common Crawl
    writes one member per record), decompressed INCREMENTALLY so the
    working set stays one record, not the inflated file."""
    if data[:2] == b"\x1f\x8b":
        return parse_warc_stream(_gunzip_chunks(data))
    return parse_warc_stream(iter((data,)))


def http_body(payload: bytes) -> bytes:
    """Body of an ``application/http`` response payload: everything
    after the first blank line (HTTP status line + headers stripped).
    Common Crawl's ``response`` records store the full HTTP message —
    the crawl CONTENT is the body. A payload without a header/body
    separator passes through whole (truncated captures exist in real
    crawls; dropping them is the caller's policy, not the parser's)."""
    i = payload.find(b"\r\n\r\n")
    return payload[i + 4 :] if i != -1 else payload


# read_warc output-batch bounds: flush an Arrow batch as soon as EITHER
# is hit, so downstream sees steady ~batch-sized units and the task's
# parsed working set stays O(batch), never O(inflated file). 32MB of
# payload ~= a few Arrow IPC frames; 1024 records keeps tiny-page WARCs
# from degenerating into one giant batch of offsets.
READ_WARC_BATCH_RECORDS = 1024
READ_WARC_BATCH_BYTES = 32 << 20


def warc_record_batches(
    paths,
    contents,
    batch_records: int = READ_WARC_BATCH_RECORDS,
    batch_bytes: int = READ_WARC_BATCH_BYTES,
):
    """Parse WARC file blobs into BOUNDED Arrow RecordBatches.

    The full chain is streaming end to end: gzip members decompress
    incrementally (_gunzip_chunks), records parse incrementally
    (parse_warc_stream), and this stage flushes an Arrow batch every
    ``batch_records`` records or ``batch_bytes`` of payload — so peak
    task memory is the compressed blob binaryFile hands us plus ONE
    output batch, not the ~5x inflated file (tests/test_warc.py pins
    this with a tracemalloc ceiling)."""
    import pyarrow as pa

    names = ["warc_file", "rec_type", "url", "warc_ts_s", "content_type", "html"]
    cols: dict[str, list] = {k: [] for k in ("f", "t", "u", "ts", "ct", "p")}
    pending = 0

    def _flush() -> "pa.RecordBatch":
        nonlocal pending
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(cols["f"], pa.string()),
                pa.array(cols["t"], pa.string()),
                pa.array(cols["u"], pa.string()),
                pa.array(cols["ts"], pa.int64()),
                pa.array(cols["ct"], pa.string()),
                pa.array(cols["p"], pa.binary()),
            ],
            names,
        )
        for v in cols.values():
            v.clear()
        pending = 0
        return batch

    for path_, blob in zip(paths, contents):
        fname = os.path.basename(path_)
        for rec_type, url, ts_s, ctype, payload in parse_warc(bytes(blob)):
            if rec_type not in (
                "resource", "response", "conversion", "metadata"
            ):
                continue
            if rec_type == "response" and ctype.startswith("application/http"):
                payload = http_body(payload)
            cols["f"].append(fname)
            cols["t"].append(rec_type)
            cols["u"].append(url)
            cols["ts"].append(ts_s)
            cols["ct"].append(ctype)
            cols["p"].append(payload)
            pending += len(payload)
            if len(cols["f"]) >= batch_records or pending >= batch_bytes:
                yield _flush()
    if cols["f"]:
        yield _flush()


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: binaryFile scan (one task per file — the
    Common Crawl distribution unit) -> Arrow-batched record parse with
    BOUNDED output batches (warc_record_batches). Returns (warc_file,
    rec_type, url, warc_ts_s, content_type, html) for resource/response
    records; warcinfo/request/metadata records are skipped. For
    ``response`` records whose Content-Type is ``application/http``
    (the Common Crawl shape), ``html`` is the HTTP BODY — status line
    and headers are stripped record-side, so the downstream pages
    pipeline sees content bytes either way."""
    import pyarrow as pa

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            # one blob materialized at a time (an input batch can carry
            # several ~1GB files; to_pylist would hold them all at once)
            n = batch.num_rows
            yield from warc_record_batches(
                (batch.column("path")[i].as_py() for i in range(n)),
                (batch.column("content")[i].as_py() for i in range(n)),
            )

    return files.mapInArrow(_gen, READ_WARC_DDL)


def write_warc_files(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts_s",
    html_col: str = "html",
    compress: bool = True,
    ctype_col: str | None = None,
    record_type: str = "resource",
) -> DataFrame:
    """Distributed WARC sink: each partition becomes one
    ``part-<pid>.warc[.gz]`` written executor-side; returns the manifest
    (path, n_records, n_bytes) as a DataFrame (nothing is collected to
    the driver). Repartition/sort the input first to choose file layout;
    file content is deterministic given the partitioning. ``out_dir``
    must be visible to every executor (local mode, NFS, or a mounted
    object store) — on a plain-HDFS cluster swap the open() for the
    Hadoop FS API or stage via the parquet sink."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()

        def _records():
            for batch in batches:
                u_arr = batch.column(url_col)
                t_arr = batch.column(ts_col)
                h_arr = batch.column(html_col)
                c_arr = batch.column(ctype_col) if ctype_col else None
                for i in range(batch.num_rows):
                    yield (
                        u_arr[i].as_py(),
                        int(t_arr[i].as_py()),
                        bytes(h_arr[i].as_py()),
                        c_arr[i].as_py() if c_arr is not None else None,
                    )

        ext = "warc.gz" if compress else "warc"
        path_ = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        # attempt-scoped temp + atomic rename: a zombie/speculative twin
        # attempt writes its OWN temp file, and only a completed attempt
        # publishes — concurrent attempts can no longer interleave into
        # a corrupt final file. os.replace is atomic on POSIX; last
        # completed attempt wins with identical bytes (deterministic
        # serialization, gzip mtime=0).
        tmp_ = f"{path_}.inprogress-{ctx.taskAttemptId()}"
        n_records = 0
        try:
            with open(tmp_, "wb") as raw:
                sink = (
                    # filename="" + mtime=0: no attempt-specific temp
                    # path or clock leaks into the gzip header, so
                    # bytes stay deterministic per partition content
                    gzip.GzipFile(filename="", fileobj=raw, mode="wb", mtime=0)
                    if compress
                    else raw
                )
                # record-at-a-time stream: peak memory is ONE record,
                # not the partition (serialize -> compress -> write)
                for chunk in serialize_warc_records(
                        _records(), f"part-{pid:05d}", record_type):
                    sink.write(chunk)
                    n_records += 1
                if compress:
                    sink.close()
            n_records -= 1  # the leading warcinfo record is framing
            n_bytes = os.path.getsize(tmp_)
            os.replace(tmp_, path_)
        except BaseException:
            try:
                os.remove(tmp_)
            except OSError:
                pass
            raise
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([path_], pa.string()),
                pa.array([n_records], pa.int64()),
                pa.array([n_bytes], pa.int64()),
            ],
            ["path", "n_records", "n_bytes"],
        )

    cols = [url_col, ts_col, html_col] + ([ctype_col] if ctype_col else [])
    return df.select(*cols).mapInArrow(
        _gen, "path string, n_records long, n_bytes long"
    )


def write_wat_files(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts_s",
    meta_col: str = "meta_json",
    compress: bool = True,
) -> DataFrame:
    """Distributed WAT sink — Common Crawl's metadata companion format
    (``*.warc.wat.gz``): one WARC ``metadata`` record per page with
    Content-Type application/json and caller-built JSON metadata
    (outlinks, title, envelope fields — webops.outlink_array +
    F.to_json build the canonical payload) as the UTF-8 body. Thin
    shape over write_warc_files like write_wet_files, so it inherits
    the record-streamed writer, attempt-scoped atomic publish, and
    manifest-not-collect contract; read_warc re-ingests the output
    (``metadata`` records pass through payload-untouched), closing
    WARC + WAT + WET + CDX — the full Common Crawl distribution set."""
    from pyspark.sql import functions as F

    wat = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts_s"),
        F.encode(F.col(meta_col), "utf-8").alias("body"),
        F.lit("application/json").alias("ctype"),
    )
    return write_warc_files(
        wat, out_dir, url_col="url", ts_col="warc_ts_s", html_col="body",
        compress=compress, ctype_col="ctype", record_type="metadata",
    )


def write_wet_files(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts_s",
    text_col: str = "text",
    compress: bool = True,
) -> DataFrame:
    """Distributed WET sink — Common Crawl's extracted-text companion
    format (``*.warc.wet.gz``): one WARC ``conversion`` record per page
    with Content-Type text/plain and the UTF-8 extracted text as the
    payload. A thin shape over write_warc_files, so it inherits the
    record-at-a-time streaming writer, the attempt-scoped atomic
    publish, and the manifest-not-collect contract. read_warc reads the
    output back (conversion records pass through with their payload
    untouched — no HTTP envelope to strip), closing the
    raw-crawl -> extract -> WET -> re-ingest loop."""
    from pyspark.sql import functions as F

    wet = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts_s"),
        F.encode(F.col(text_col), "utf-8").alias("body"),
        F.lit("text/plain").alias("ctype"),
    )
    return write_warc_files(
        wet, out_dir, url_col="url", ts_col="warc_ts_s", html_col="body",
        compress=compress, ctype_col="ctype", record_type="conversion",
    )
