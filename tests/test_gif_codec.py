"""Real stdlib GIF codec (round 5).

GIF needs no codec wheel: the container is struct framing and the
compression is LZW, implemented here by hand from the GIF89a spec —
variable-width codes (min+1 .. 12 bits) packed LSB-first into 255-byte
sub-blocks, dictionary rebuilt on CLEAR, the KwKwK self-reference
case, and the tail width-sync subtlety (the decoder adds an entry on
the final data code that the encoder does not, so the encoder must
mirror the decoder's potential width bump before emitting EOI — found
by fuzzing, locked by the boundary test below).

Spec pinning is independent of our own encoder: a 1x1 GIF is
hand-assembled byte-by-byte (codes [CLEAR=4, 0, EOI=5] at 3 bits,
LSB-first packed to 0x44 0x01) and must decode to its known pixel.

Reference parity note: the reference repo has no media pipeline — this
is part of the beyond-reference multimodal surface, alongside the
PNG/BMP/PPM/WAV codecs.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.multimodal import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_image,
    encode_gif,
)


# --------------------------------------------------------------------------
# Spec pinning: hand-assembled container, no encode_gif involved
# --------------------------------------------------------------------------


def test_hand_assembled_gif_decodes():
    """1x1 red pixel, built from raw spec arithmetic: min code size 2,
    codes [CLEAR=4, 0, EOI=5] at width 3, packed LSB-first:
    bits 001|000|101 -> bytes 0x44, 0x01."""
    hand = (
        b"GIF89a"
        + bytes([1, 0, 1, 0, 0x80, 0, 0])  # LSD: 1x1, GCT present, 2 entries
        + bytes([255, 0, 0, 0, 0, 0])  # GCT: red, black
        + b"\x2c" + bytes([0, 0, 0, 0, 1, 0, 1, 0, 0])  # image descriptor
        + bytes([2])  # LZW min code size
        + bytes([2, 0x44, 0x01])  # one 2-byte data sub-block
        + b"\x00\x3b"  # block terminator + trailer
    )
    assert decode_gif(hand) == (1, 1, [255, 0, 0])


def test_gif87a_signature_accepted():
    pal = [(9, 8, 7), (1, 2, 3)]
    g = bytearray(encode_gif(2, 1, [0, 1], pal))
    g[:6] = b"GIF87a"
    assert decode_gif(bytes(g)) == (2, 1, [9, 8, 7, 1, 2, 3])


# --------------------------------------------------------------------------
# LZW layer
# --------------------------------------------------------------------------


def test_lzw_kwkwk_case():
    # a constant run forces code == next_code immediately
    assert _lzw_decode(2, _lzw_encode(2, [0] * 50)) == [0] * 50


def test_lzw_tail_width_boundary():
    """The decoder's add on the FINAL data code can land exactly on a
    width threshold; the encoder must emit EOI one bit wider then.
    With min_code_size=2 (first free code 6), the threshold 8 is hit
    after 2 adds — a 4-symbol non-matching stream ends right on it."""
    for idx in ([3, 2, 1, 0], [0, 1, 2, 3, 0, 1], [1, 0, 3, 2, 1, 0, 3]):
        assert _lzw_decode(2, _lzw_encode(2, idx)) == idx


def test_lzw_midstream_clear_resets():
    import random

    rng = random.Random(5)
    idx = [rng.randrange(4) for _ in range(400)]
    assert _lzw_decode(2, _lzw_encode(2, idx, clear_every=3)) == idx
    assert _lzw_decode(2, _lzw_encode(2, idx, clear_every=1)) == idx


def test_lzw_4096_dictionary_reset():
    import random

    rng = random.Random(9)
    idx = [rng.randrange(256) for _ in range(12000)]  # fills the 12-bit dict
    assert _lzw_decode(8, _lzw_encode(8, idx)) == idx


@settings(max_examples=80, deadline=None)
@given(
    mcs=st.sampled_from([2, 3, 4, 8]),
    n=st.integers(1, 400),
    seed=st.integers(0, 2**32 - 1),
    ce=st.sampled_from([None, 1, 3, 7, 100]),
)
def test_lzw_roundtrip_property(mcs, n, seed, ce):
    import random

    rng = random.Random(seed)
    idx = [rng.randrange(1 << mcs) for _ in range(n)]
    assert _lzw_decode(mcs, _lzw_encode(mcs, idx, ce)) == idx


def test_lzw_truncated_and_garbage_raise():
    data = _lzw_encode(2, [0, 1, 2, 3, 0, 1])
    with pytest.raises(ValueError):
        _lzw_decode(2, data[:1])
    # a code far beyond next_code is invalid
    with pytest.raises(ValueError, match="invalid GIF LZW code|truncated"):
        _lzw_decode(2, b"\xff\xff\xff\xff")


# --------------------------------------------------------------------------
# Container round-trips + gates
# --------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    npal=st.sampled_from([2, 3, 4, 16, 64, 256]),
    seed=st.integers(0, 2**32 - 1),
    ce=st.sampled_from([None, 7, 100]),
)
def test_gif_roundtrip_property(w, h, npal, seed, ce):
    import random

    rng = random.Random(seed)
    pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(npal)]
    idx = [rng.randrange(npal) for _ in range(w * h)]
    g = encode_gif(w, h, idx, pal, clear_every=ce,
                   comment=b"x" * rng.choice([0, 10, 300]))
    want = []
    for v in idx:
        want += pal[v]
    assert decode_gif(g) == (w, h, want)
    assert decode_image(g, {}) == want  # dispatch: REAL decode path


def test_interlace_flag_and_spliced_second_frame():
    pal = [(0, 0, 0), (1, 1, 1)]
    # hand-setting the interlace flag on a 2x2 stream is benign: the
    # appendix-E permutation of rows [0, 1] is the identity, so the
    # now-supported interlace path must decode it to the same pixels
    g = bytearray(encode_gif(2, 2, [0, 1, 1, 0], pal))
    desc_at = bytes(g).index(b"\x2c")
    g[desc_at + 9] |= 0x40
    assert decode_gif(bytes(g)) == decode_gif(encode_gif(2, 2, [0, 1, 1, 0], pal))
    # two image blocks = animation (r5 closed the gate): splicing a
    # second descriptor before the trailer yields two parsed frames,
    # and decode_gif returns the poster (first) frame's pixels
    one = encode_gif(1, 1, [0], pal)
    frame = one[one.index(b"\x2c") : -1]  # descriptor through block terminator
    multi = one[:-1] + frame + b"\x3b"
    from recon_spark.operators.multimodal import decode_gif_frames

    cw, ch, frames = decode_gif_frames(multi)
    assert (cw, ch) == (1, 1) and len(frames) == 2
    assert decode_gif(multi) == (1, 1, list(pal[0]))


def test_truncated_and_invalid_containers_raise():
    pal = [(0, 0, 0), (1, 1, 1)]
    g = encode_gif(3, 3, [0, 1] * 4 + [0], pal)
    with pytest.raises((ValueError, IndexError)):
        decode_gif(g[:15])
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + g[6:])
    # trailer with no image data
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(g[: g.index(b"\x2c")] + b"\x3b")


# --------------------------------------------------------------------------
# Spark-side: genuine containers + oracle parity
# --------------------------------------------------------------------------


def test_generate_media_gif_payloads_are_genuine(spark):
    from recon_spark.operators.multimodal import generate_media_gif

    rows = generate_media_gif(spark, 8).collect()
    assert len(rows) == 8
    for r in rows:
        p = bytes(r["payload"])
        assert p[:6] == b"GIF89a" and p[-1:] == b"\x3b"
        assert b"recon_spark synthetic" in p  # comment extension present
        w, h, px = decode_gif(p)
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
        assert len(px) == w * h * 3


def test_decode_gif_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_MULTIMODAL_DECODE_GIF, q_multimodal_decode_gif
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_multimodal_decode_gif, SQL_MULTIMODAL_DECODE_GIF, SF_ORACLE)


def test_gif_frames_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_MULTIMODAL_GIF_FRAMES,
        q_multimodal_gif_frames,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(
        spark, ddb, q_multimodal_gif_frames, SQL_MULTIMODAL_GIF_FRAMES, SF_ORACLE
    )


# --------------------------------------------------------------------------
# four-pass interlace (round 5)
# --------------------------------------------------------------------------


def test_gif_interlace_order_is_appendix_e():
    from recon_spark.operators.multimodal import _gif_interlace_order

    assert _gif_interlace_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert _gif_interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    assert _gif_interlace_order(1) == [0]
    for h in range(1, 40):
        assert sorted(_gif_interlace_order(h)) == list(range(h))


def _descriptor_at(p: bytes) -> int:
    """Walk the container structurally to the image descriptor (a raw
    index(b'\\x2c') can false-match palette or LZW bytes)."""
    import struct as _s

    packed = _s.unpack_from("<HHBBB", p, 6)[2]
    pos = 13 + (3 * (2 << (packed & 7)) if packed & 0x80 else 0)
    while p[pos] == 0x21:  # extensions: label + sub-blocks
        pos += 2
        while p[pos]:
            pos += 1 + p[pos]
        pos += 1
    assert p[pos] == 0x2C
    return pos


@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_interlaced_gif_decodes_to_same_pixels(w, h, seed):
    import hashlib as _h

    d = _h.sha256(str(seed).encode()).digest()
    pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
    idx = [d[(j + 3) % 32] % 16 for j in range(w * h)]
    plain = decode_gif(encode_gif(w, h, idx, pal))
    inter = decode_gif(encode_gif(w, h, idx, pal, interlace=True))
    assert inter == plain
    # descriptor flag is really set
    p = encode_gif(w, h, idx, pal, interlace=True)
    assert p[_descriptor_at(p) + 9] & 0x40


def test_generated_interlaced_gifs_flag_and_match(spark):
    from recon_spark.operators.multimodal import generate_media_gif

    rows = generate_media_gif(spark, 15).collect()
    flagged = [r for r in rows if r["media_id"] % 5 == 2]
    assert flagged
    for r in flagged:
        p = bytes(r["payload"])
        assert p[_descriptor_at(p) + 9] & 0x40
        w, h, px = decode_gif(p)
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])


# --------------------------------------------------------------------------
# r5: animation (multi-frame) support
# --------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(6, 20),
    h=st.integers(6, 16),
    nframes=st.integers(1, 4),
    seed=st.integers(0, 2**32 - 1),
)
def test_animation_frames_round_trip_property(w, h, nframes, seed):
    """Every frame of an animated GIF round-trips exactly: rect offsets,
    per-frame delays, local color tables, interlaced frames, and GCT
    frames mixed in one container, NETSCAPE loop extension skipped."""
    import random

    from recon_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = random.Random(seed)
    gct = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(16)]
    frames = []
    for f in range(nframes):
        left, top = rng.randrange(w // 2), rng.randrange(h // 2)
        fw, fh = rng.randrange(1, w - left + 1), rng.randrange(1, h - top + 1)
        lct = ([tuple(rng.randrange(256) for _ in range(3)) for _ in range(8)]
               if rng.random() < 0.4 else None)
        n = len(lct) if lct else 16
        idx = [rng.randrange(n) for _ in range(fw * fh)]
        frames.append((left, top, fw, fh, idx, rng.randrange(500), lct,
                       rng.random() < 0.3, None))
    p = encode_gif_animation(w, h, frames, gct, loop=rng.randrange(4))
    cw, ch, got = decode_gif_frames(p)
    assert (cw, ch) == (w, h) and len(got) == nframes
    for (l, t, fw, fh, idx, delay, lct, _, _), (gl, gt, gw, gh, gd, rgb) in zip(
            frames, got):
        table = lct if lct else gct
        assert (gl, gt, gw, gh, gd) == (l, t, fw, fh, delay)
        assert rgb == [c for i in idx for c in table[i]]


def test_poster_frame_composite_with_transparency():
    """decode_gif on an animated/offset/transparent container returns
    the poster: background color under the first frame's transparent
    pixels and outside its rect."""
    from recon_spark.operators.multimodal import encode_gif_animation

    pal = [(10, 10, 10), (200, 0, 0), (0, 200, 0), (9, 9, 9)]
    # canvas 4x3, bg index 3; frame 0 is a 2x2 rect at (1,1) with index
    # 1 transparent
    frames = [
        (1, 1, 2, 2, [0, 1, 1, 2], 5, None, False, 1),
        (0, 0, 1, 1, [2], 5, None, False, None),
    ]
    p = encode_gif_animation(4, 3, frames, pal, bg_index=3)
    w, h, px = decode_gif(p)
    assert (w, h) == (4, 3)
    grid = [tuple(px[3 * k:3 * k + 3]) for k in range(12)]
    bg = pal[3]
    assert grid == [
        bg, bg, bg, bg,
        bg, pal[0], bg, bg,   # (1,1)=idx0; (2,1)=idx1 transparent -> bg
        bg, bg, pal[2], bg,   # (1,2)=idx1 transparent -> bg; (2,2)=idx2
    ]
