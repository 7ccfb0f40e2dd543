#!/usr/bin/env python
"""N->4N scaling evidence for the MJPEG-AVI video decode path (r5).

Protocol = scripts/scale_flac.py: genuine containers PRE-STAGED to
parquet once, each level timed in a FRESH JVM via subprocess, Python
workers warmed outside the timed section, force() defeats column
pruning, eff = (t_lo / t_hi) / (cores_hi / cores_lo).

Staged set: 8,000 genuine MJPEG AVIs, 8 frames of 64x48 grayscale each
(64,000 frames through the full chain: RIFF walk, idx1 verification,
per-frame baseline-JPEG Huffman + IDCT). The timed kernel is
decode_avi_frames + the scene-cut delta — the exact production
composition q_video_scene_cuts runs.

    python scripts/scale_video.py            # both levels + summary
    python scripts/scale_video.py --cores N  # one level, raw JSON
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from scripts._scale_common import (  # noqa: E402
    force,
    print_summary,
    size_splits,
    timed as _timed,
    warm_python_workers as _warm_python_workers,
)

VID_N = 8000
VID_FRAMES = 8
VID_W, VID_H = 64, 48
N_LO, N_HI = 2, 8


def stage_avi(n: int) -> str:
    import tempfile

    import pyarrow as pa

    from recon_spark.session import get_spark

    staged = os.path.join(
        tempfile.gettempdir(), f"avi_scale_{n}x{VID_FRAMES}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

        def _gen(batches):
            import hashlib

            from recon_spark.operators.multimodal import encode_jpeg
            from recon_spark.operators.video import encode_avi_mjpeg

            for batch in batches:
                ids = batch.column("id").to_pylist()
                payloads = []
                for i in ids:
                    d = hashlib.sha256(f"aviscale:{i}".encode()).digest()
                    frames = []
                    for f in range(VID_FRAMES):
                        vals = [
                            d[(5 + (x // 8) + 2 * (y // 8) + f) % 32]
                            for y in range(VID_H) for x in range(VID_W)
                        ]
                        frames.append(
                            encode_jpeg(VID_W, VID_H, vals, samples=1))
                    payloads.append(
                        encode_avi_mjpeg(VID_W, VID_H, frames, 1, 10))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids, pa.int64()),
                     pa.array(payloads, pa.binary())],
                    ["media_id", "payload"],
                )

        spark.range(0, n).mapInArrow(
            _gen, "media_id long, payload binary"
        ).repartition(64).write.mode("overwrite").parquet(staged)
        spark.stop()
    return staged


def run_level(cores: int) -> dict:
    import pyarrow as pa

    from recon_spark.operators.video import decode_avi_frames, frame_delta_cuts
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                _, frames = decode_avi_frames(bytes(p))
                cuts = frame_delta_cuts(frames)
                sums.append(sum(c["delta_sum"] for c in cuts))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "delta_total"],
            )

    out: dict = {"cores": cores}
    staged = os.environ["RECON_SCALE_AVI_PARQUET"]
    size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"avi_scan_only_x{VID_N}",
           lambda: media.select("media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"avi_decode_cuts_x{VID_N}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, delta_total long"),
           f"{VID_N:,} staged MJPEG AVIs x {VID_FRAMES} frames of "
           f"{VID_W}x{VID_H}: RIFF walk + idx1 verify + JPEG decode + "
           "scene-cut delta per video")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_AVI_PARQUET"] = stage_avi(VID_N)
    levels = {}
    for cores in (N_LO, N_HI):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True, text=True, env=os.environ, check=True,
        )
        levels[cores] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(levels, indent=2))
    print_summary(levels, N_LO, N_HI)


if __name__ == "__main__":
    main()
