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

The codec layer itself is STUBBED (this container ships no image/audio
libs): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded by
the content hash) produces stable "pixels" so the distributed plumbing
— schema, batch shapes, partition behavior — is fully testable.
"""

from __future__ import annotations

import hashlib
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


def _decode_dims(meta: dict, fake: bool) -> tuple[int, int]:
    """The (w, h) layout of decode_image's output: the fake decoder
    collapses dims to small values; a real codec returns true metadata
    dims. Single source of truth — resize_image must index with the
    SAME dims the decoder laid pixels out with."""
    if fake:
        return (meta.get("width") or 8) % 8 + 1, (meta.get("height") or 8) % 8 + 1
    return meta["width"], meta["height"]


def decode_image(payload: bytes, meta: dict, fake: bool = False) -> list[int]:
    """Decode an image payload to a flat pixel list. STUB: real decoding
    needs an image codec library not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (e.g. Pillow); "
            "run with fake=True for the deterministic test decoder"
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
    """Decode an audio payload to centered samples. STUB: real decoding
    needs an audio codec library. The fake decoder strides the first
    ``max_samples`` of the track (sample j = digest[j % 32] - 128),
    deterministic and SQL-replicable."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires a codec library (e.g. soundfile); "
            "run with fake=True for the deterministic test decoder"
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
