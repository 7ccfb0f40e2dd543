"""WARC source/sink unit tests (recon_spark/warc.py): framing and
compression edge cases the registry round-trip query can't isolate,
plus the distributed sink manifest. The oracle-backed end-to-end check
is the `warc_ingest` registry query (tests/test_oracles_pipeline.py)."""

import gzip
import io

import pytest

from recon_spark.warc import parse_warc, read_warc, serialize_warc, write_warc_files

RECS = [
    ("https://a.org/1", 1_700_000_000, b"<html>one</html>"),
    # payload containing the record separator: Content-Length framing
    # must carry the parse across it (a split-on-separator parser dies)
    ("https://a.org/2", 1_700_000_037, b"binary\r\n\r\nwith separator inside"),
    ("https://a.org/3", 1_700_000_074, b""),
]


def test_roundtrip_plain_and_gzip():
    blob = serialize_warc(RECS, "f0")
    for data in (blob, gzip.compress(blob)):
        got = [r for r in parse_warc(data) if r[0] == "resource"]
        assert [(u, ts, p) for _, u, ts, _, p in got] == RECS
    # the warcinfo record is present and skipped by type
    assert [r[0] for r in parse_warc(blob)][0] == "warcinfo"


def test_multi_member_gzip_common_crawl_style():
    """Common Crawl compresses each record as its own gzip member and
    concatenates; the reader must decompress all members."""
    members = b""
    for i, rec in enumerate(RECS):
        members += gzip.compress(serialize_warc([rec], f"m{i}"))
    got = [r for r in parse_warc(members) if r[0] == "resource"]
    assert [(u, ts, p) for _, u, ts, _, p in got] == RECS


def test_header_case_insensitivity():
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: RESOURCE\r\n"
        b"WARC-TARGET-URI: https://x.org\r\n"
        b"warc-date: 2026-01-01T00:00:00Z\r\n"
        b"CONTENT-LENGTH: 2\r\n"
        b"\r\nhi\r\n\r\n"
    )
    (rec,) = list(parse_warc(raw))
    assert rec[1] == "https://x.org" and rec[4] == b"hi"
    assert rec[2] == 1_767_225_600  # 2026-01-01T00:00:00Z


def test_truncated_record_raises():
    blob = serialize_warc(RECS[:1], "f0")
    with pytest.raises(ValueError, match="truncated|unterminated"):
        list(parse_warc(blob[:-12]))


def test_distributed_sink_and_source(spark, tmp_path):
    df = spark.createDataFrame(
        [(u, ts, p) for u, ts, p in RECS] * 4,
        "url string, warc_ts_s long, html binary",
    ).repartition(3)
    out = str(tmp_path / "warc")
    manifest = write_warc_files(df, out).collect()
    assert sum(m["n_records"] for m in manifest) == 12
    assert len(manifest) == 3 and all(m["path"].endswith(".warc.gz") for m in manifest)
    back = read_warc(spark, out)
    assert back.count() == 12  # warcinfo records excluded
    by_url = (
        back.groupBy("url").count().orderBy("url").collect()
    )
    assert [(r["url"], r["count"]) for r in by_url] == [
        ("https://a.org/1", 4), ("https://a.org/2", 4), ("https://a.org/3", 4)
    ]
    # payload fidelity through gzip + binaryFile + Arrow
    got = {
        (r["url"], bytes(r["html"]))
        for r in back.select("url", "html").distinct().collect()
    }
    assert got == {(u, p) for u, _, p in RECS}


def test_sink_bytes_are_deterministic(spark, tmp_path):
    df = spark.createDataFrame(
        [(u, ts, p) for u, ts, p in RECS],
        "url string, warc_ts_s long, html binary",
    ).repartition(1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc_files(df, a).collect()
    write_warc_files(df, b).collect()
    fa = open(f"{a}/part-00000.warc.gz", "rb").read()
    fb = open(f"{b}/part-00000.warc.gz", "rb").read()
    assert fa == fb  # gzip mtime pinned to 0; record ids positional


# --------------------------------------------------------------------------
# Property: serialize -> parse round-trips arbitrary binary payloads
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

payloads = st.lists(
    st.binary(min_size=0, max_size=64),  # includes \r\n\r\n, gzip magic, NULs
    min_size=1,
    max_size=8,
)


@given(payloads, st.booleans())
@settings(max_examples=50, deadline=None)
def test_warc_roundtrip_property(blobs, compress):
    recs = [
        (f"https://p.org/{i}", 1_700_000_000 + 37 * i, b)
        for i, b in enumerate(blobs)
    ]
    data = serialize_warc(recs, "prop")
    if compress:
        data = gzip.compress(data)
    got = [(u, ts, p) for t, u, ts, _, p in parse_warc(data) if t == "resource"]
    assert got == recs


def test_common_crawl_response_records_yield_http_body(spark, tmp_path):
    """Common Crawl stores fetched pages as WARC `response` records
    whose payload is the full HTTP message (Content-Type:
    application/http; msgtype=response); read_warc must surface the
    BODY. Fractional-second WARC-Dates (WARC/1.1) parse too."""
    from recon_spark.warc import _format_record, http_body

    body = b"<html>cc page</html>"
    http_msg = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"X-Hdr: a\r\n\r\n" + body
    )
    rec = _format_record(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", "<urn:t:0>"),
            ("WARC-Date", "2026-01-01T00:00:00.500000Z"),
            ("WARC-Target-URI", "https://cc.org/p"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http_msg,
    )
    p = tmp_path / "cc.warc"
    p.write_bytes(rec)
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["html"]) == body
    assert rows[0]["warc_ts_s"] == 1_767_225_600
    # headerless/truncated payload passes through whole
    assert http_body(b"no separator here") == b"no separator here"


@given(payloads, st.integers(min_value=1, max_value=97))
@settings(max_examples=30, deadline=None)
def test_warc_stream_parser_chunk_invariance(blobs, chunk_size):
    """The incremental parser must be invariant to how input bytes are
    chunked (the property that makes the bounded-memory path safe)."""
    from recon_spark.warc import parse_warc_stream

    recs = [(f"https://c.org/{i}", 1_700_000_000 + i, b) for i, b in enumerate(blobs)]
    data = serialize_warc(recs, "ch")
    chunks = (data[i : i + chunk_size] for i in range(0, len(data), chunk_size))
    got = [(u, ts, p) for t, u, ts, _, p in parse_warc_stream(chunks) if t == "resource"]
    assert got == recs


# --------------------------------------------------------------------------
# r5: bounded-batch reader + streaming sink (VERDICT r4 "What's wrong" #2,
# ADVICE r4 warc items)
# --------------------------------------------------------------------------


@given(payloads, st.integers(min_value=1, max_value=5), st.integers(min_value=1, max_value=64))
@settings(max_examples=30, deadline=None)
def test_reader_batch_boundary_invariance(blobs, batch_records, batch_bytes):
    """warc_record_batches must yield the same rows regardless of where
    the record/byte flush thresholds fall (the chunk-invariance
    property extended to the Arrow batch boundary)."""
    from recon_spark.warc import warc_record_batches

    recs = [(f"https://b.org/{i}", 1_700_000_000 + i, b) for i, b in enumerate(blobs)]
    blob = serialize_warc(recs, "bb")
    batches = list(
        warc_record_batches(
            ["f.warc"], [blob], batch_records=batch_records, batch_bytes=batch_bytes
        )
    )
    rows = [
        (b.column("url")[i].as_py(), b.column("warc_ts_s")[i].as_py(),
         b.column("html")[i].as_py())
        for b in batches
        for i in range(b.num_rows)
    ]
    assert rows == recs
    # every non-final batch hit a threshold
    for b in batches[:-1]:
        payload = sum(len(b.column("html")[i].as_py()) for i in range(b.num_rows))
        assert b.num_rows >= batch_records or payload >= batch_bytes


def test_reader_peak_memory_is_batch_not_file():
    """A WARC that inflates to ~48MB must parse with a working set of a
    few output batches, not the whole inflated file: the compressed
    blob (small: zero-filled payloads) is held by the caller, so any
    accumulation of parsed records would show up in the tracemalloc
    peak."""
    import tracemalloc

    from recon_spark.warc import warc_record_batches

    n, size = 192, 256 * 1024  # 48MB inflated
    recs = [(f"https://m.org/{i}", 1_700_000_000 + i, bytes(size)) for i in range(n)]
    blob = gzip.compress(serialize_warc(recs, "mem"))
    assert len(blob) < 2 << 20
    seen = 0
    tracemalloc.start()
    for b in warc_record_batches(["f.warc.gz"], [blob], batch_bytes=1 << 20):
        seen += b.num_rows
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert seen == n
    # bound: a handful of 1MB batches + parser buffers, far below 48MB
    assert peak < 16 << 20, f"peak {peak} bytes suggests whole-file buffering"


def test_sink_streams_and_publishes_atomically(spark, tmp_path):
    """The sink writes via an attempt-scoped temp file and renames on
    success: after a clean run no .inprogress files remain, the final
    files parse, and the manifest matches the data."""
    df = spark.createDataFrame(
        [(f"https://s.org/{i}", 1_700_000_000 + i, b"x" * i) for i in range(20)],
        "url string, warc_ts_s long, html binary",
    ).repartition(2)
    out = str(tmp_path / "atomic")
    manifest = write_warc_files(df, out).collect()
    import os

    names = sorted(os.listdir(out))
    assert names == ["part-00000.warc.gz", "part-00001.warc.gz"]
    assert not [n for n in names if ".inprogress" in n]
    assert sum(m["n_records"] for m in manifest) == 20
    for m in manifest:
        assert m["n_bytes"] == os.path.getsize(m["path"])
        got = [r for r in parse_warc(open(m["path"], "rb").read()) if r[0] == "resource"]
        assert len(got) == m["n_records"]


def test_sink_carries_per_record_content_types(spark, tmp_path):
    """Round 5: the sink's ctype_col writes each record's own
    Content-Type and the reader surfaces it — the mixed-type shape a
    real crawl shard has (pages + images + robots.txt)."""
    from recon_spark.warc import read_warc, write_warc_files

    df = spark.createDataFrame(
        [
            ("https://ex.org/a", 1_700_000_000, b"<html>a</html>", "text/html"),
            ("https://ex.org/b.png", 1_700_000_001, b"\x89PNGfake", "image/png"),
            ("https://ex.org/robots.txt", 1_700_000_002, b"User-agent: *",
             "text/plain"),
        ],
        "url string, warc_ts_s long, html binary, content_type string",
    ).repartition(1)
    out = str(tmp_path / "mixed")
    write_warc_files(df, out, ctype_col="content_type").count()
    got = {
        r["url"]: (r["content_type"], bytes(r["html"]))
        for r in read_warc(spark, out).collect()
    }
    assert got["https://ex.org/a"] == ("text/html", b"<html>a</html>")
    assert got["https://ex.org/b.png"] == ("image/png", b"\x89PNGfake")
    assert got["https://ex.org/robots.txt"] == ("text/plain", b"User-agent: *")
    # default stays text/html when no ctype_col is given (r4 byte contract)
    out2 = str(tmp_path / "plain")
    write_warc_files(df.drop("content_type"), out2).count()
    assert {r["content_type"] for r in read_warc(spark, out2).collect()} == {
        "text/html"
    }


def test_warc_media_decode_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_WARC_MEDIA_DECODE, q_warc_media_decode
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_warc_media_decode, SQL_WARC_MEDIA_DECODE, SF_ORACLE)


def test_decode_image_safe_statuses_deterministic_over_corrupt_shard():
    """Ground truth for the tolerant query's oracle: for EVERY media id
    in the corrupt staging, decode_image_safe must land on exactly the
    status the id arithmetic assigns — in particular every half-
    truncated payload of every format/dims/interlace combination must
    RAISE inside decode_image (not silently return short pixels), or
    the Spark side would report 'ok' rows the oracle marks 'corrupt'."""
    import hashlib

    from recon_spark.operators.multimodal import decode_image, decode_image_safe
    from recon_spark.operators.multimodal import synth_crawl_image
    from recon_spark.queries.extra import _WARC_TOL_N

    for i in range(_WARC_TOL_N):
        p, _ = synth_crawl_image(i)
        if i % 5 == 3:
            status, px = decode_image_safe(p[: len(p) // 2], {})
            assert status == "corrupt" and px == [], (i, status)
        elif i % 5 == 1:
            d = hashlib.sha256(f"42:{i}".encode()).digest()
            stub = b"RIFF" + d[:4] + b"WEBPVP8 " + d[4:20]
            status, px = decode_image_safe(stub, {})
            assert status == "unsupported" and px == [], (i, status)
        else:
            status, px = decode_image_safe(p, {})
            assert status == "ok" and px == decode_image(p, {}), (i, status)


def test_warc_media_tolerant_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_WARC_MEDIA_TOLERANT,
        q_warc_media_tolerant,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(
        spark, ddb, q_warc_media_tolerant, SQL_WARC_MEDIA_TOLERANT, SF_ORACLE
    )


# --------------------------------------------------------------------------
# WET (extracted-text conversion records)
# --------------------------------------------------------------------------


def test_wet_sink_writes_conversion_records(spark, tmp_path):
    """write_wet_files emits WARC 'conversion' records with text/plain
    payloads that read_warc round-trips byte-for-byte, including
    non-ASCII text through the UTF-8 encode/decode."""
    from pyspark.sql import functions as F

    from recon_spark.warc import parse_warc, read_warc, write_wet_files

    rows = [
        ("https://a.com/1", 100, "plain text"),
        ("https://b.com/2", 200, "café — naïve 中文"),
        ("https://c.com/3", 300, "line1\r\n\r\nline2"),  # CRLFs in payload
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts_s", "text"])
    out = str(tmp_path / "wet")
    manifest = write_wet_files(df.repartition(1), out).collect()
    assert sum(m["n_records"] for m in manifest) == 3
    # raw container check: conversion type + text/plain
    import glob
    import gzip as _gzip

    (path,) = glob.glob(out + "/*.warc.gz")
    recs = [
        r for r in parse_warc(_gzip.open(path, "rb").read())
        if r[0] != "warcinfo"  # the per-file framing record
    ]
    assert len(recs) == 3
    assert all(t == "conversion" for t, *_ in recs)
    assert all(ct == "text/plain" for _, _, _, ct, _ in recs)
    # spark read-back round trip
    back = {
        r["url"]: (r["warc_ts_s"], r["text"])
        for r in read_warc(spark, out)
        .where(F.col("rec_type") == "conversion")
        .select("url", "warc_ts_s", F.decode("html", "utf-8").alias("text"))
        .collect()
    }
    assert back == {u: (ts, tx) for u, ts, tx in rows}


def test_wet_roundtrip_query_matches_oracle(spark, ddb):
    from recon_spark.queries.pipeline import _sql_warc_real_html, q_wet_roundtrip
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_wet_roundtrip, _sql_warc_real_html(), SF_ORACLE)


def test_wat_sink_writes_metadata_records(spark, tmp_path):
    """write_wat_files emits WARC 'metadata' records with
    application/json payloads that read_warc round-trips exactly —
    WARC + WAT + WET + CDX closes the Common Crawl distribution set."""
    import json

    from pyspark.sql import functions as F

    from recon_spark.warc import parse_warc, read_warc, write_wat_files

    rows = [
        ("https://a.com/1", 100, json.dumps({"url": "https://a.com/1",
                                             "outlinks": ["https://b.com/x"]})),
        ("https://b.com/2", 200, json.dumps({"url": "https://b.com/2",
                                             "outlinks": []})),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts_s", "meta_json"])
    out = str(tmp_path / "wat")
    manifest = write_wat_files(df.repartition(1), out).collect()
    assert sum(m["n_records"] for m in manifest) == 2
    import glob
    import gzip as _gzip

    (path,) = glob.glob(out + "/*.warc.gz")
    recs = [r for r in parse_warc(_gzip.open(path, "rb").read())
            if r[0] != "warcinfo"]
    assert all(t == "metadata" for t, *_ in recs)
    assert all(ct == "application/json" for _, _, _, ct, _ in recs)
    back = {
        r["url"]: json.loads(bytes(r["html"]).decode("utf-8"))
        for r in read_warc(spark, out)
        .where(F.col("rec_type") == "metadata")
        .collect()
    }
    assert back["https://a.com/1"]["outlinks"] == ["https://b.com/x"]
    assert back["https://b.com/2"]["outlinks"] == []


def test_wat_roundtrip_query_matches_oracle(spark, ddb):
    from recon_spark.queries.pipeline import SQL_HOST_LINK_GRAPH, q_wat_roundtrip
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_wat_roundtrip, SQL_HOST_LINK_GRAPH, SF_ORACLE)
