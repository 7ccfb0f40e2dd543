"""Audio curation metrics — the audio analog of the Gopher text gate.

Speech/audio corpus curation gates on signal statistics the way text
curation gates on word statistics (textstats.py:gopher_quality_filter):
a track that is mostly silence, hard-clipped, or DC-stuck is dropped
before it costs feature-extraction compute. ``audio_metrics`` computes
the classic gate inputs over decoded PCM with INTEGER-ONLY arithmetic,
so the DuckDB oracle replicates every value bit-exactly (no float
accumulation order to drift):

- peak          max |s|
- sum_sq        sum of s^2 (the integer RMS numerator)
- n_clip        samples at or beyond full-scale-minus-1 (hard clipping:
                consumer encoders saturate at the rail, so counting
                near-rail samples catches both saturation and wrap)
- n_silent      samples with |s| below full_scale >> 6 (a -36 dBFS-ish
                integer threshold)
- zcross        sign transitions (strictly-negative boundary) — the
                cheap voiced/unvoiced + DC-stuck discriminator

The pass rule mirrors the Gopher gate's shape: integer-ratio
comparisons (n_clip * 50 < n and n_silent * 2 < n, i.e. under 2%
clipping and under 50% silence), so pass/fail is exact, not
float-rounded.
"""

from __future__ import annotations


def audio_metrics(samples: list[int], bps: int) -> dict:
    """Integer gate metrics over one channel of PCM (see module doc)."""
    fs = 1 << (bps - 1)
    clip_at = fs - 1
    silent_below = fs >> 6
    n = len(samples)
    peak = 0
    sum_sq = 0
    n_clip = 0
    n_silent = 0
    zcross = 0
    prev_neg = None
    for s in samples:
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        sum_sq += s * s
        if a >= clip_at:
            n_clip += 1
        if a < silent_below:
            n_silent += 1
        neg = s < 0
        if prev_neg is not None and neg != prev_neg:
            zcross += 1
        prev_neg = neg
    return {"n_samples": n, "peak": peak, "sum_sq": sum_sq,
            "n_clip": n_clip, "n_silent": n_silent, "zcross": zcross}


def audio_gate(m: dict) -> bool:
    """The integer-ratio pass rule: under 2% clipped AND under 50%
    silent. Exact by construction — both sides are integers."""
    n = m["n_samples"]
    return m["n_clip"] * 50 < n and m["n_silent"] * 2 < n


_FP_FRAMES = 17  # 17 energy frames -> 16 delta-sign bits


def audio_fingerprint(samples: list[int]) -> int:
    """16-bit energy-delta-sign fingerprint (the Chromaprint idea
    reduced to its integer core): split the track into 17 equal-share
    frames (boundaries k*n//17, so every length partitions
    deterministically), compute each frame's integer energy (sum of
    squares), and emit bit k = energy[k+1] > energy[k].

    AMPLITUDE-INVARIANT by construction: scaling every sample by c
    multiplies every energy by c^2 and preserves all comparisons — a
    re-encoded / volume-normalized copy of a track fingerprints
    identically, which is exactly the near-duplicate class exact
    hashing misses. Dedup then becomes a 2-byte-key aggregation (the
    simhash scale shape: map-side fingerprint, short-key shuffle,
    never pairwise audio comparison).
    """
    n = len(samples)
    if n < _FP_FRAMES:
        raise ValueError(f"fingerprint needs >= {_FP_FRAMES} samples")
    energies = []
    for k in range(_FP_FRAMES):
        lo = k * n // _FP_FRAMES
        hi = (k + 1) * n // _FP_FRAMES
        energies.append(sum(s * s for s in samples[lo:hi]))
    fp = 0
    for k in range(_FP_FRAMES - 1):
        if energies[k + 1] > energies[k]:
            fp |= 1 << k
    return fp


def audio_windows(samples: list[int], bps: int, win: int = 8
                  ) -> list[dict]:
    """Fixed-window segmentation with silence flags — the audio analog
    of doc chunking (textstats' doc_chunks): ASR-style pipelines cut
    tracks into training windows and trim leading/trailing silence
    before feature extraction. Integer-only, window w covers samples
    [w*win, min((w+1)*win, n)): per-window sum of squares and a silent
    flag (mean square below the gate threshold squared, computed as
    the exact integer comparison sum_sq < n_w * (fs >> 6)^2), plus a
    kept flag marking the silence-trimmed span [first non-silent
    window, last non-silent window]."""
    fs = 1 << (bps - 1)
    thr_sq = (fs >> 6) ** 2
    n = len(samples)
    wins = []
    for w in range((n + win - 1) // win):
        part = samples[w * win:(w + 1) * win]
        sum_sq = sum(s * s for s in part)
        wins.append({"win_idx": w, "n_samples": len(part),
                     "sum_sq": sum_sq,
                     "silent": sum_sq < len(part) * thr_sq})
    non_silent = [w["win_idx"] for w in wins if not w["silent"]]
    lo = min(non_silent) if non_silent else -1
    hi = max(non_silent) if non_silent else -2
    for w in wins:
        w["kept"] = lo <= w["win_idx"] <= hi
    return wins
