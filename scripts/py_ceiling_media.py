"""Raw-Python concurrency ceiling for the media-decode workloads
(same methodology as py_ceiling_html.py: identical pure function over
identical bytes in K independent OS processes, no Spark, per-process
throughput at K=2 vs K=8). The r5 scaling table shows png_decode at
eff ~0.68 and gif_decode at ~0.70 for local[2]->local[8] on a
shuffle-free map-only plan; if bare CPython shows the same per-process
slowdown at 8-way concurrency, those ops sit at this host's memory-bus
/ virtualization ceiling, not at a plan limit — on a real cluster each
executor brings its own memory bus.

    python scripts/py_ceiling_media.py [png|gif]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITEMS_PER_PROC = int(os.environ.get("CEILING_ITEMS_PER_PROC", 150_000))


def _make_payloads(kind: str) -> list[bytes]:
    """The same containers generate_media_png/_gif/_jpeg emit, built once."""
    from recon_spark.operators.multimodal import encode_gif, encode_jpeg, encode_png

    out = []
    for i in range(500):
        d = hashlib.sha256(f"42:{i}".encode()).digest()
        if kind == "jpeg":
            m = i % 3
            if m == 0:
                w, h = 9 + i % 8, 9 + i % 6
            elif m == 1:
                w, h = 8 + i % 9, 8 + i % 5
            else:
                w, h = 17 + i % 8, 10 + i % 6
            if m == 1:
                vals = []
                for y in range(h):
                    for x in range(w):
                        k = (x // 8) + 2 * (y // 8)
                        vals += [d[k % 32], d[(k + 7) % 32], d[(k + 13) % 32]]
                out.append(encode_jpeg(w, h, vals, samples=3))
            else:
                vals = [d[(5 + (x // 8) + 2 * (y // 8)) % 32]
                        for y in range(h) for x in range(w)]
                out.append(encode_jpeg(w, h, vals))
        elif kind == "png":
            w, h = 2 + i % 6, 2 + i % 5
            filters = [(y + i) % 5 for y in range(h)]
            text = (b"tEXt", b"Software\x00recon_spark")
            if i % 3 == 0:
                vals = []
                for idx in range(w * h):
                    vals += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32]]
                out.append(encode_png(w, h, vals, color_type=2, filters=filters,
                                      ancillary=(text,)))
            elif i % 3 == 1:
                vals = []
                for idx in range(w * h):
                    vals += [d[idx % 32], d[(idx + 7) % 32], d[(idx + 13) % 32],
                             d[(idx + 19) % 32]]
                out.append(encode_png(w, h, vals, color_type=6, filters=filters,
                                      ancillary=(text,)))
            else:
                pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
                vals = [d[(idx + 3) % 32] % 16 for idx in range(w * h)]
                out.append(encode_png(w, h, vals, color_type=3, palette=pal,
                                      filters=filters, ancillary=(text,)))
        else:
            w, h = 8 + i % 16, 8 + i % 12
            pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
            idx = [d[(j + 3) % 32] % 16 for j in range(w * h)]
            out.append(encode_gif(w, h, idx, pal,
                                  clear_every=100 if i % 4 == 0 else None,
                                  comment=b"recon_spark synthetic"))
    return out


def _worker(kind: str, payloads: list[bytes], n: int, q: "mp.Queue") -> None:
    from recon_spark.operators.multimodal import decode_gif, decode_jpeg, decode_png

    fn = {"png": decode_png, "gif": decode_gif, "jpeg": decode_jpeg}[kind]
    t0 = time.monotonic()
    total = 0
    for i in range(n):
        total += sum(fn(payloads[i % len(payloads)])[-1])
    q.put((time.monotonic() - t0, total))


def run_level(kind: str, k: int, payloads: list[bytes]) -> dict:
    q: "mp.Queue" = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(kind, payloads, ITEMS_PER_PROC, q))
        for _ in range(k)
    ]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    per_proc = sum(r[0] for r in results) / k
    return {
        "procs": k,
        "wall_sec": round(wall, 2),
        "mean_proc_sec": round(per_proc, 2),
        "items_per_sec_total": round(k * ITEMS_PER_PROC / wall),
    }


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "png"
    payloads = _make_payloads(kind)
    lo = run_level(kind, 2, payloads)
    hi = run_level(kind, 8, payloads)
    ceiling = round(lo["mean_proc_sec"] / hi["mean_proc_sec"], 3)
    print(json.dumps({
        "kind": kind, "lo": lo, "hi": hi,
        "per_proc_ceiling_2to8": ceiling,
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "note": "ceiling = t_proc@2 / t_proc@8 (1.0 = no contention); "
                "max achievable local[2]->local[8] eff for this workload "
                "on this host is ~ceiling",
    }))


if __name__ == "__main__":
    main()
