"""Progressive (SOF2) JPEG codec tests.

The reference repo's contract for media payloads is typed opaque
binary + real decode where the stdlib allows (SURVEY §2 multimodal
rows; reference has no media codecs — this is the beyond-reference
crawl-pipeline surface). Progressive is the one JPEG mode a real
Common-Crawl shard contains in volume that round-4 left gated; these
tests lock its decoder against three independent anchors:

1. a HAND-ASSEMBLED container with hand-packed scan bits for all four
   T.81 Annex G scan kinds (DC first, DC refine, AC first, AC refine),
   decoded against coefficients worked out on paper;
2. the baseline decoder: a progressive encoding of ANY image must
   decode pixel-identical to the baseline encoding of the same image
   (both reconstruct the same quantized coefficients — hypothesis
   sweeps gray/color, 4:2:0/4:2:2, restart intervals, real and
   all-ones quant tables);
3. the multi-scan path: a hand-built BASELINE container with one scan
   per component (the non-interleaved layout round-4 gated) decodes
   identical to its interleaved twin.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.multimodal import (
    _JPEG_ZZ,
    _build_huffman,
    _emit_block,
    _huff_codes,
    _jpeg_emit_headers,
    _jpeg_plan,
    _jpeg_seg,
    _JpegBitWriter,
    _qblocks_to_plane,
    decode_image,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

K_LUMA = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
          14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
          18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
          49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]


def _pix(seed: int, n: int, smooth: bool) -> list[int]:
    rng = np.random.default_rng(seed)
    if smooth:
        base = int(rng.integers(0, 256))
        return [int(min(255, max(0, base + d)))
                for d in rng.integers(-6, 7, size=n)]
    return [int(v) for v in rng.integers(0, 256, size=n)]


# ---------------------------------------------------------------- anchor 1:
# hand-assembled progressive container, scan bits packed by hand

def test_hand_assembled_progressive_decodes():
    """8x8 gray, all-ones qtable, final coefficients DC=-6, zz[1]=3,
    zz[10]=-1, built from four scans whose entropy bytes are worked
    out on paper (see inline math) — pins the point transforms, the
    raw DC-refine bit, the AC-refine correction-bit ordering
    (symbol, sign, buffered corrections), and EOB0."""
    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _jpeg_seg(0xC2, bytes([8]) + (8).to_bytes(2, "big") * 2 +
                     bytes([1, 1, 0x11, 0]))
    # scan 1 — DC first, Al=1: v = -6>>1 = -3, diff=-3, csize=2,
    # vbits(-3,2)=0b00; DC table {2: '0'} -> bits '0'+'00', pad 1s
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += bytes([0b00011111])
    # scan 2 — AC first 1..63, Al=1: zz[1] point-transforms to 1
    # (sym 0x01 '10' + bit '1'), zz[10]=-1 transforms to 0, EOB0
    # ('0'); table {0x00: '0', 0x01: '10'}
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14) +
                     bytes([0x00, 0x01]))
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    out += bytes([0b10101111])
    # scan 3 — DC refine Ah=1,Al=0: one raw bit (-6 & 1) = 0
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    out += bytes([0b01111111])
    # scan 4 — AC refine 1..63, Ah=1,Al=0: zz[1] already nonzero ->
    # correction bit (3&1)=1 buffers; zz[10] newly nonzero after 8
    # zero-history positions -> sym 0x81 '10' + sign '0' + buffered
    # '1'; tail all zero -> EOB0 '0'; table {0x00:'0', 0x81:'10'}
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14) +
                     bytes([0x00, 0x81]))
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    out += bytes([0b10010111])
    out += b"\xff\xd9"

    w, h, spp, px = decode_jpeg(bytes(out))
    assert (w, h, spp) == (8, 8, 1)
    zz = np.zeros((1, 64))
    zz[0, 0], zz[0, 1], zz[0, 10] = -6, 3, -1
    want = _qblocks_to_plane(zz, np.ones((8, 8)), 8, 8).reshape(-1)
    assert px == [int(v) for v in want]


# ---------------------------------------------------------------- anchor 2:
# progressive == baseline on arbitrary images

@settings(max_examples=25, deadline=None)
@given(st.integers(4, 40), st.integers(4, 40), st.integers(0, 2 ** 31),
       st.booleans(), st.booleans())
def test_progressive_equals_baseline_gray(w, h, seed, smooth, lossy):
    vals = _pix(seed, w * h, smooth)
    qt = K_LUMA if lossy else None
    base = encode_jpeg(w, h, vals, qtable=qt)
    prog = encode_jpeg_progressive(w, h, vals, qtable=qt)
    assert decode_jpeg(prog) == decode_jpeg(base)


@settings(max_examples=20, deadline=None)
@given(st.integers(4, 34), st.integers(4, 34), st.integers(0, 2 ** 31),
       st.sampled_from(["444", "422", "420"]), st.sampled_from([0, 1, 2, 5]),
       st.booleans())
def test_progressive_equals_baseline_color(w, h, seed, sub, ri, lossy):
    vals = _pix(seed, w * h * 3, smooth=False)
    qt = K_LUMA if lossy else None
    base = encode_jpeg(w, h, vals, samples=3, subsample=sub,
                       restart_interval=ri, qtable=qt)
    prog = encode_jpeg_progressive(w, h, vals, samples=3, subsample=sub,
                                   restart_interval=ri, qtable=qt)
    assert decode_jpeg(prog) == decode_jpeg(base)


def test_block_constant_contract_survives_progressive():
    """The exactness contract (all-ones qtable + per-8x8-block-constant
    pixels) holds through the progressive path too: decode returns the
    ORIGINAL pixels bit-for-bit."""
    w, h = 19, 13
    vals = [(40 + 17 * ((x // 8) + 2 * (y // 8))) % 256
            for y in range(h) for x in range(w)]
    assert decode_jpeg(encode_jpeg_progressive(w, h, vals)) == (w, h, 1, vals)


def test_eob_runs_span_blocks_and_compress():
    """A flat image's AC scans are pure cross-block EOB runs: the
    whole progressive payload must stay tiny (EOBn with extension
    bits, not per-block EOB symbols) and still decode exactly."""
    w, h = 128, 64  # 128 blocks
    vals = [77] * (w * h)
    prog = encode_jpeg_progressive(w, h, vals)
    assert decode_jpeg(prog) == (w, h, 1, vals)
    assert len(prog) < 400  # 128 blocks x several AC scans, bytes not kB


def test_progressive_restart_markers_checked():
    vals = _pix(3, 24 * 17, smooth=False)
    prog = encode_jpeg_progressive(24, 17, vals, restart_interval=2)
    assert decode_jpeg(prog) == decode_jpeg(encode_jpeg(24, 17, vals,
                                                        restart_interval=2))
    # corrupt the first RST index (FFD0 -> FFD7): must fail loudly
    bad = prog.replace(b"\xff\xd0", b"\xff\xd7", 1)
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bad)


def test_truncated_progressive_raises():
    prog = encode_jpeg_progressive(16, 16, _pix(5, 256, smooth=False))
    with pytest.raises(ValueError):
        decode_jpeg(prog[: len(prog) * 2 // 3])


def test_custom_scan_script_spectral_only():
    """Spectral selection without successive approximation (Al=0
    everywhere) is also a legal script real encoders emit."""
    vals = _pix(9, 20 * 12, smooth=False)
    script = [((0,), 0, 0, 0, 0), ((0,), 1, 9, 0, 0), ((0,), 10, 63, 0, 0)]
    prog = encode_jpeg_progressive(20, 12, vals, scan_script=script)
    assert decode_jpeg(prog) == decode_jpeg(encode_jpeg(20, 12, vals))


def test_decode_image_dispatches_progressive():
    vals = [(10 + 30 * ((x // 8) + 2 * (y // 8))) % 256
            for y in range(9) for x in range(10)]
    p = encode_jpeg_progressive(10, 9, vals)
    assert decode_image(p, {}, fake=False) == vals


# ---------------------------------------------------------------- anchor 3:
# baseline multi-scan (one scan per component), hand-built

def test_baseline_multiscan_decodes_like_interleaved():
    """Round 4 gated ns != ncomp; the generic scan loop now decodes
    baseline non-interleaved scans over each component's OWN
    ceil-block grid (T.81 A.2). Build a 3-scan 4:2:0 container from
    the shared plan and compare against the interleaved twin."""
    w, h = 21, 14
    vals = _pix(13, w * h * 3, smooth=False)
    plan = _jpeg_plan(w, h, vals, 3, None, None, "420")
    out = bytearray(b"\xff\xd8")
    _jpeg_emit_headers(out, w, h, 3, plan, 0xC0, 0)
    for ci, (qb, gbw, hi, vi) in enumerate(plan["grids"]):
        cw, ch = -(-w * hi // 2), -(-h * vi // 2)  # max_h = max_v = 2
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        blocks = [qb[r * gbw + c].tolist()
                  for r in range(cbh) for c in range(cbw)]
        freqs: tuple[dict, dict] = ({}, {})
        pred = 0
        for zz in blocks:
            pred = _emit_block(None, zz, pred, {}, {}, freq_only=freqs)
        db, dv = _build_huffman(freqs[0])
        ab, av = _build_huffman(freqs[1])
        out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(db[1:17]) + bytes(dv))
        out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(ab[1:17]) + bytes(av))
        bw = _JpegBitWriter()
        pred = 0
        for zz in blocks:
            pred = _emit_block(bw, zz, pred, _huff_codes(db, dv),
                               _huff_codes(ab, av))
        out += _jpeg_seg(0xDA, bytes([1, ci + 1, 0x00, 0, 63, 0]))
        out += bw.flush()
    out += b"\xff\xd9"
    assert decode_jpeg(bytes(out)) == decode_jpeg(
        encode_jpeg(w, h, vals, samples=3, subsample="420"))
