#!/usr/bin/env python
"""N->4N scaling evidence for the FLAC decode path (round 5).

Protocol = scripts/scale_r5b_ops.py: genuine containers PRE-STAGED to
parquet once (the generator's cost must not pollute the operator
timing), each level timed in a FRESH JVM via subprocess, Python workers
warmed outside the timed section, force() defeats column pruning,
eff = (t_lo / t_hi) / (cores_hi / cores_lo).

The staged tracks are real RFC 9639 streams sized for timing (2,000
samples per channel, mono/stereo mix, rotating subframe-type +
stereo-mode + Rice-method policies — the same rotation the query
generator uses, so the timed work IS the production decode: bit-level
Rice decode, prediction, stereo reconstruction, CRC-8/16 and the MD5
over every decoded sample).

    python scripts/scale_flac.py            # both levels + summary
    python scripts/scale_flac.py --cores N  # one level, raw JSON
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

FLAC_N = 3200          # tracks (half stereo) -> ~9.6M decoded samples
FLAC_SAMPLES = 2000    # per channel
N_LO, N_HI = 2, 8


def _track_pcm(i: int) -> tuple[dict, list[list[int]]]:
    """Timing-sized analog of flac._track_spec's policy rotation."""
    import hashlib

    d = hashlib.sha256(f"flacscale:{i}".encode()).digest()
    nch = 2 if i % 2 == 0 else 1
    chans = []
    for ch in range(nch):
        vals = []
        for j in range(FLAC_SAMPLES):
            hi = d[(2 * j + 5 * ch) % 32]
            lo = d[(2 * j + 5 * ch + 13) % 32]
            vals.append(hi * 256 + lo - 32768)
        chans.append(vals)
    spec = {
        "stereo_mode": ["independent", "left_side", "right_side",
                        "mid_side"][i % 4] if nch == 2 else "independent",
        "type_sel": i, "partition_order": i % 3,
        "rice2": i % 7 == 5, "force_escape": i % 7 == 3,
    }
    return spec, chans


def stage_flac(n: int) -> str:
    import tempfile

    import pyarrow as pa

    from recon_spark.operators.flac import encode_flac
    from recon_spark.session import get_spark

    staged = os.path.join(
        tempfile.gettempdir(), f"flac_scale_{n}x{FLAC_SAMPLES}")
    if not os.path.isdir(staged):
        spark = get_spark(master="local[8]", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

        def _gen(batches):
            for batch in batches:
                ids = batch.column("id").to_pylist()
                payloads = []
                for i in ids:
                    spec, chans = _track_pcm(i)
                    payloads.append(encode_flac(
                        44100, 16, chans, block_size=256,
                        stereo_mode=spec["stereo_mode"],
                        type_sel=spec["type_sel"],
                        partition_order=spec["partition_order"],
                        rice2=spec["rice2"],
                        force_escape=spec["force_escape"],
                    ))
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

    from recon_spark.operators.flac import decode_flac
    from recon_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores * 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1000).selectExpr("sum(id)").collect()

    def _gen(batches):
        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            sums = []
            for p in batch.column("payload").to_pylist():
                chans = decode_flac(bytes(p))[2]  # CRCs + MD5 verified
                sums.append(sum(abs(s) for c in chans for s in c))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sums, pa.int64())],
                ["media_id", "abs_sum"],
            )

    out: dict = {"cores": cores}
    staged = os.environ["RECON_SCALE_FLAC_PARQUET"]
    size_splits(spark, staged)
    _warm_python_workers(spark)
    media = spark.read.parquet(staged)
    _timed(out, f"flac_scan_only_x{FLAC_N}",
           lambda: media.select("media_id", F.length("payload").alias("n")),
           "pure-JVM scan+length baseline over the same staged parquet")
    _timed(out, f"flac_decode_x{FLAC_N}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen, "media_id long, abs_sum long"),
           f"{FLAC_N:,} pre-staged genuine FLAC streams, "
           f"{FLAC_SAMPLES:,} samples/ch, mono/stereo + policy rotation")

    def _gen_probe(batches):
        from recon_spark.operators.probe import probe_media

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            ns = [probe_media(bytes(p))["n_frames"]
                  for p in batch.column("payload").to_pylist()]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(ns, pa.int64())],
                ["media_id", "n_frames"],
            )

    _timed(out, f"flac_probe_x{FLAC_N}",
           lambda: media.select("media_id", "payload").mapInArrow(
               _gen_probe, "media_id long, n_frames long"),
           "header-only probe over the SAME staged payloads — the "
           "decode/probe time ratio is the triage budget headroom")
    spark.stop()
    return out


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return
    os.environ["RECON_SCALE_FLAC_PARQUET"] = stage_flac(FLAC_N)
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
