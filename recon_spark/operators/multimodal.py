"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract a 100 TB multimodal training pipeline needs:
- payloads are opaque ``binary`` columns with a typed metadata struct
  (media_type, width/height or sample_rate/duration, codec)
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  functions over ``mapInPandas``/``mapInArrow`` so bytes never cross a
  row-at-a-time Python boundary
- partitioning: payload tables bucket by content key; metadata-only
  plans must prune the binary column (column pruning keeps the 99% of
  bytes out of any scan that doesn't decode)

Codec story (round 4): formats the Python STDLIB can decode are decoded
for real — BMP and binary PPM via ``struct`` parsing, WAV/PCM16 via the
``wave`` module — with ``generate_media_real`` emitting genuine
BMP/PPM/WAV payloads whose pixel/sample values are a deterministic
function of a sha256 digest, so the DuckDB oracle can verify that the
REAL container parse inverts generation byte-exactly. Formats that
need an external codec library (PNG/JPEG/MP3/H.264 — not in this
container) keep the honest NotImplementedError gate, with ``fake=True``
selecting the deterministic test decoder for plumbing tests.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, sample_rate int, "
    "duration_ms int, codec string"
)


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media table: (media_id, payload, meta).
    Payload bytes are a pure function of (seed, media_id)."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                payloads.append(h * (8 + i % 8))  # 256..480 bytes
                if i % 3 == 0:
                    metas.append(("image/png", 32 + i % 64, 24 + i % 48, None, None, "png"))
                elif i % 3 == 1:
                    metas.append(("audio/wav", None, None, 16000, 1000 + i % 5000, "pcm16"))
                else:
                    metas.append(("video/mp4", 64, 48, None, 2000 + i % 9000, "h264"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(payloads, pa.binary()),
                    meta_arr,
                ],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


# --------------------------------------------------------------------------
# Real stdlib codecs: BMP / binary PPM / WAV (PCM16 mono)
# --------------------------------------------------------------------------


def encode_bmp(w: int, h: int, rgb: list[int]) -> bytes:
    """24-bit uncompressed BMP from a top-down row-major RGB list
    (len = w*h*3). Writes the on-disk convention: bottom-up rows, BGR
    channel order, rows padded to 4-byte boundaries."""
    pad = (-(w * 3)) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            i = (y * w + x) * 3
            row += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        row += b"\x00" * pad
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    file_size = 14 + 40 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a 24-bit uncompressed BMP to (w, h, top-down RGB list).
    Handles both bottom-up (positive height) and top-down (negative
    height) pixel orders and per-row 4-byte padding."""
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h_raw, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (bpp={bpp})")
    h = abs(h_raw)
    top_down = h_raw < 0
    stride = (w * 3 + 3) // 4 * 4
    out = [0] * (w * h * 3)
    for row in range(h):
        y = row if top_down else h - 1 - row
        base = offset + row * stride
        for x in range(w):
            b, g, r = payload[base + x * 3 : base + x * 3 + 3]
            i = (y * w + x) * 3
            out[i], out[i + 1], out[i + 2] = r, g, b
    return w, h, out


def encode_ppm(w: int, h: int, rgb: list[int]) -> bytes:
    """Binary PPM (P6, maxval 255) from a top-down row-major RGB list."""
    return f"P6\n{w} {h}\n255\n".encode() + bytes(rgb)


def decode_ppm(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a binary PPM (P6) to (w, h, top-down RGB list). Tolerates
    arbitrary whitespace and '#' comments in the header, per spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval),
    # comments run # .. newline; pixel data starts after ONE whitespace
    # byte following maxval
    pos, tokens = 2, []
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM")
    pos += 1  # the single whitespace after maxval
    return w, h, list(payload[pos : pos + w * h * 3])


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """PCM16 mono WAV from signed int samples (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a PCM16 mono WAV to (sample_rate, signed int samples)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise NotImplementedError("only PCM16 mono WAV")
        sr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return sr, list(struct.unpack(f"<{len(raw) // 2}h", raw))


def generate_media_real(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Media table with REAL container payloads: media_id % 3 == 0 →
    24-bit BMP, 1 → binary PPM, 2 → PCM16 WAV. Pixel/sample values are
    a pure function of sha256(f"{seed}:{media_id}") so a relational
    oracle can recompute the expected decode output without any codec:
    pixel idx=(y*w+x) has channels (d[idx%32], d[(idx+7)%32],
    d[(idx+13)%32]); audio sample j = (d[j%32] - 128) * 101."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            payloads, metas = [], []
            for i in ids:
                d = hashlib.sha256(f"{seed}:{i}".encode()).digest()
                if i % 3 == 2:
                    ns = 40 + i % 32
                    samples = [(d[j % 32] - 128) * 101 for j in range(ns)]
                    payloads.append(encode_wav(8000, samples))
                    metas.append(
                        ("audio/wav", None, None, 8000, ns * 1000 // 8000 + 1, "pcm16")
                    )
                else:
                    w, h = 2 + i % 5, 2 + i % 4
                    rgb = []
                    for idx in range(w * h):
                        rgb += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32]]
                    if i % 3 == 0:
                        payloads.append(encode_bmp(w, h, rgb))
                        metas.append(("image/bmp", w, h, None, None, "bmp"))
                    else:
                        payloads.append(encode_ppm(w, h, rgb))
                        metas.append(("image/x-portable-pixmap", w, h, None, None, "ppm"))
            meta_arr = pa.StructArray.from_arrays(
                [
                    pa.array([m[0] for m in metas], pa.string()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.int32()),
                    pa.array([m[4] for m in metas], pa.int32()),
                    pa.array([m[5] for m in metas], pa.string()),
                ],
                names=["media_type", "width", "height", "sample_rate", "duration_ms", "codec"],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()), meta_arr],
                ["media_id", "payload", "meta"],
            )

    return spark.range(0, n).mapInArrow(
        _gen, f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"
    )


def _decode_dims(meta: dict, fake: bool) -> tuple[int, int]:
    """The (w, h) layout of decode_image's output: the fake decoder
    collapses dims to small values; a real codec returns true metadata
    dims. Single source of truth — resize_image must index with the
    SAME dims the decoder laid pixels out with."""
    if fake:
        return (meta.get("width") or 8) % 8 + 1, (meta.get("height") or 8) % 8 + 1
    return meta["width"], meta["height"]


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> list[int]:
    """Decode an image payload to a flat pixel list. BMP and binary PPM
    decode FOR REAL via stdlib struct parsing (top-down row-major RGB,
    len = w*h*3); other formats (PNG/JPEG) still need a codec library
    not present in this container and keep the honest gate, with
    fake=True selecting the deterministic test decoder."""
    if not fake:
        if payload[:2] == b"BM":
            return decode_bmp(payload)[2]
        if payload[:2] == b"P6":
            return decode_ppm(payload)[2]
        raise NotImplementedError(
            "non-BMP/PPM image decoding requires a codec library (e.g. "
            "Pillow); run with fake=True for the deterministic test decoder"
        )
    w, h = _decode_dims(meta, fake=True)
    # fake "pixels" are seeded by sha256 over the payload's hex form —
    # equally deterministic, and expressible in ANSI SQL (DuckDB's
    # sha256 takes VARCHAR only), so the driver oracle can replicate
    # the whole decode→pool pipeline exactly
    digest = hashlib.sha256(payload.hex().encode()).digest()
    return [digest[(x * h + y) % 32] for x in range(w) for y in range(h)]


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    fake: bool = True,
    n_features: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over image rows: filters to
    image media (metadata-only predicate — the binary column is not
    touched for non-image rows thanks to column pruning), decodes per
    batch, emits fixed-width feature vectors."""
    import numpy as np
    import pyarrow as pa

    out_ddl = f"media_id long, features array<double>"

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column(meta_col).to_pylist()
            feats = []
            for p, m in zip(payloads, metas):
                px = np.asarray(decode_image(p, m, fake=fake), dtype=np.float64)
                # fixed-width pooled features: mean over n_features chunks
                chunks = np.array_split(px, n_features)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(feats, pa.list_(pa.float64()))],
                ["media_id", "features"],
            )

    images = df.where(F.col(f"{meta_col}.media_type").startswith("image/"))
    return images.select("media_id", payload_col, meta_col).mapInArrow(_gen, out_ddl)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows — pure JVM (sequence over duration), the decode of each frame
    being a downstream stubbed step. Shape: one-to-many, no Python."""
    videos = df.where(F.col(f"{meta_col}.media_type").startswith("video/"))
    return videos.select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, {meta_col}.duration_ms, {every_ms})")
        ).alias("frame_ts_ms"),
    )


def resize_image(
    df: DataFrame,
    target_w: int = 4,
    target_h: int = 4,
    payload_col: str = "payload",
    meta_col: str = "meta",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched nearest-neighbor resize over image rows:
    (media_id, pixels ARRAY<INT>) of exactly target_w*target_h values.
    Source pixel for output (x, y) is (x*w // tw, y*h // th) — integer
    arithmetic only, so the DuckDB oracle replicates the fake-decode →
    resize pipeline exactly. Real decoding stays behind the same codec
    stub as decode_image."""
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column(meta_col).to_pylist()
            out = []
            for p, m in zip(payloads, metas):
                px = decode_image(p, m, fake=fake)
                w, h = _decode_dims(m, fake=fake)  # dims the decoder used
                out.append(
                    [
                        px[(x * w // target_w) * h + (y * h // target_h)]
                        for x in range(target_w)
                        for y in range(target_h)
                    ]
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(out, pa.list_(pa.int32()))],
                ["media_id", "pixels"],
            )

    images = df.where(F.col(f"{meta_col}.media_type").startswith("image/"))
    return images.select("media_id", payload_col, meta_col).mapInArrow(
        _gen, "media_id long, pixels array<int>"
    )


def decode_audio(payload: bytes, meta: dict, fake: bool = False, max_samples: int = 1024) -> list[int]:
    """Decode an audio payload to signed samples. PCM16 mono WAV
    decodes FOR REAL via the stdlib ``wave`` module; compressed formats
    (MP3/AAC) still need a codec library and keep the honest gate. The
    fake decoder strides the first ``max_samples`` of the track
    (sample j = digest[j % 32] - 128), deterministic and
    SQL-replicable."""
    if not fake:
        if payload[:4] == b"RIFF":
            return decode_wav(payload)[1][:max_samples]
        raise NotImplementedError(
            "non-WAV audio decoding requires a codec library (e.g. "
            "soundfile); run with fake=True for the deterministic test decoder"
        )
    sr = meta.get("sample_rate") or 16000
    dur = meta.get("duration_ms") or 0
    ns = min(max_samples, sr * dur // 1000)
    digest = hashlib.sha256(payload.hex().encode()).digest()
    return [digest[j % 32] - 128 for j in range(ns)]


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    fake: bool = True,
    n_windows: int = 4,
) -> DataFrame:
    """Arrow-batched audio features: filters to audio media (metadata
    predicate), decodes per batch (strided stub), emits mean-absolute
    energy per time window — the framing/windowing plumbing a real
    fbank/MFCC extractor slots into."""
    import numpy as np
    import pyarrow as pa

    def _gen(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            payloads = batch.column(payload_col).to_pylist()
            metas = batch.column(meta_col).to_pylist()
            feats = []
            for p, m in zip(payloads, metas):
                s = np.asarray(decode_audio(p, m, fake=fake), dtype=np.float64)
                wins = np.array_split(np.abs(s), n_windows)
                feats.append([float(w.mean()) if len(w) else 0.0 for w in wins])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(feats, pa.list_(pa.float64()))],
                ["media_id", "features"],
            )

    audio = df.where(F.col(f"{meta_col}.media_type").startswith("audio/"))
    return audio.select("media_id", payload_col, meta_col).mapInArrow(
        _gen, "media_id long, features array<double>"
    )
