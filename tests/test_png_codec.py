"""Real stdlib PNG codec (round 5).

PNG's compression layer is deflate (zlib — stdlib), so unlike
JPEG/MP3 the format is fully decodable without any codec wheel. These
tests pin the codec to the PUBLIC spec, not just to itself:

- chunk framing is checked against two public constants (the canonical
  1x1 RGBA IHDR CRC 0x1f15c489 that appears in every minimal-PNG
  reference, and the universal 12-byte IEND chunk);
- a container is hand-assembled from raw spec steps (explicit filtered
  scanlines + zlib.compress), independent of encode_png, and must
  decode to the known pixels;
- hypothesis round-trips cover all five color types x all five filter
  types x arbitrary dims/pixels/IDAT splits;
- corruption (CRC flip, truncation, bad filter byte, wrong scanline
  length) raises ValueError, as do spec-illegal depth/type combos;
- every spec-legal bit depth decodes (1/2/4/8/16 per §11.2.2):
  sub-byte packing is pinned by a hand-packed container independent
  of encode_png, and hypothesis round-trips run depth x color type x
  filters x interlace.

Reference parity note: the reference repo has no media pipeline — this
family is part of the beyond-reference LLM-training-data surface the
build brief asks for (multimodal columns with REAL decode where the
stdlib allows).
"""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.multimodal import (
    PNG_SIG,
    _paeth,
    _png_chunk,
    decode_image,
    decode_png,
    encode_png,
)

CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# --------------------------------------------------------------------------
# Spec pinning against public constants / hand-built containers
# --------------------------------------------------------------------------


def test_chunk_framing_matches_public_constants():
    # IHDR for a 1x1 8-bit RGBA PNG: its CRC-32 is the well-known
    # 1f 15 c4 89 seen in every minimal-PNG byte listing.
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    assert zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF == 0x1F15C489
    assert _png_chunk(b"IHDR", ihdr)[:8] == b"\x00\x00\x00\x0dIHDR"
    # IEND is the same 12 bytes in every PNG ever written.
    assert _png_chunk(b"IEND", b"") == b"\x00\x00\x00\x00IEND\xaeB`\x82"


def test_hand_assembled_container_decodes():
    """Build a 2x2 RGB PNG from raw spec steps (no encode_png): row 0
    unfiltered, row 1 Sub-filtered by hand. decode_png must recover the
    original pixels — this checks the decoder against the spec, not
    against our own encoder."""
    px = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    row0 = bytes([0]) + bytes(px[:6])  # filter 0: raw
    # filter 1 (Sub): first pixel raw, second minus first, mod 256
    row1 = bytes([1]) + bytes(px[6:9]) + bytes(
        (px[9 + i] - px[6 + i]) & 0xFF for i in range(3)
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(row0 + row1))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (2, 2, 2, px)


def test_paeth_predictor_spec_cases():
    # spec: nearest of a/b/c to p = a+b-c; ties prefer a, then b.
    assert _paeth(0, 0, 0) == 0
    assert _paeth(100, 50, 50) == 100  # p=100 -> exactly a
    assert _paeth(50, 100, 50) == 100  # p=100 -> exactly b
    assert _paeth(10, 20, 15) == 15  # p=15: pc=0 beats pa=pb=5 -> c
    assert _paeth(10, 20, 30) == 10  # p=0: pa=10 < pb=20 < pc=30 -> a
    assert _paeth(255, 0, 255) == 0  # p=0: pa=255, pb=0 -> b
    assert _paeth(100, 100, 0) == 100  # p=200: pa=pb=100 tie -> a


# --------------------------------------------------------------------------
# Round-trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("color_type", [0, 2, 3, 4, 6])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_roundtrip_every_colortype_x_filter(color_type, ft):
    import hashlib

    w, h, ch = 5, 4, CHANNELS[color_type]
    d = hashlib.sha256(b"png").digest()
    if color_type == 3:
        pal = [(d[k], d[(k + 11) % 32], d[(k + 23) % 32]) for k in range(16)]
        vals = [d[(i + 3) % 32] % 16 for i in range(w * h)]
        want = []
        for v in vals:
            want += pal[v]
    else:
        pal = None
        vals = [d[(i * 7 + color_type) % 32] for i in range(w * h * ch)]
        want = vals
    p = encode_png(w, h, vals, color_type=color_type, palette=pal, filters=[ft] * h)
    assert decode_png(p) == (w, h, color_type, want)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 8),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
    seed=st.integers(0, 2**32 - 1),
    idat_chunk=st.sampled_from([1, 5, 48, 1 << 20]),
)
def test_roundtrip_property(w, h, color_type, seed, idat_chunk):
    import random

    rng = random.Random(seed)
    ch = CHANNELS[color_type]
    filters = [rng.randrange(5) for _ in range(h)]
    if color_type == 3:
        pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(16)]
        vals = [rng.randrange(16) for _ in range(w * h)]
        want = []
        for v in vals:
            want += pal[v]
    else:
        pal = None
        vals = [rng.randrange(256) for _ in range(w * h * ch)]
        want = vals
    p = encode_png(
        w, h, vals, color_type=color_type, palette=pal, filters=filters,
        idat_chunk=idat_chunk, ancillary=((b"tEXt", b"k\x00v"),),
    )
    assert decode_png(p) == (w, h, color_type, want)


def test_decode_image_dispatches_png_for_real():
    vals = list(range(12))
    p = encode_png(2, 2, vals, color_type=2)
    assert decode_image(p, {}) == vals  # no fake flag: REAL decode path


# --------------------------------------------------------------------------
# Containers a real crawl would hand us: corruption + honest gates
# --------------------------------------------------------------------------


def _flip(b: bytes, i: int) -> bytes:
    out = bytearray(b)
    out[i] ^= 0xFF
    return bytes(out)


def test_crc_corruption_raises():
    p = encode_png(3, 2, list(range(18)), color_type=2, filters=[0, 0])
    # flip one byte inside the IDAT data region
    idat_at = p.index(b"IDAT")
    with pytest.raises(ValueError, match="CRC"):
        decode_png(_flip(p, idat_at + 6))


def test_truncation_raises():
    p = encode_png(3, 2, list(range(18)), color_type=2)
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(p[: len(p) - 14])  # cut into IEND framing
    with pytest.raises(ValueError):
        decode_png(p[:20])


def test_bad_filter_byte_and_wrong_scanline_length_raise():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    bad_filter = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(bytes([9, 1, 2, 3, 4, 5, 6]))
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="filter type"):
        decode_png(bad_filter)
    short = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(bytes([0, 1, 2]))
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="scanline"):
        decode_png(short)


def test_full_depth_set_and_hand_built_adam7():
    # r5 closed the depth gate: a hand-built 1x1 truecolor 16-bit
    # container (filter byte + six zero sample bytes) now decodes
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    p16 = PNG_SIG + _png_chunk(b"IHDR", ihdr16) + _png_chunk(
        b"IDAT", zlib.compress(bytes(7))
    ) + _png_chunk(b"IEND", b"")
    assert decode_png(p16) == (1, 1, 2, [0, 0, 0])
    # spec-ILLEGAL depth/type combos are container errors, not gates:
    # depth 16 palette and depth 4 truecolor both violate §11.2.2
    for depth, ct in ((16, 3), (4, 2), (3, 0)):
        ihdr_bad = struct.pack(">IIBBBBB", 1, 1, depth, ct, 0, 0, 0)
        pb = PNG_SIG + _png_chunk(b"IHDR", ihdr_bad) + _png_chunk(
            b"IDAT", zlib.compress(bytes(7))
        ) + _png_chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="depth"):
            decode_png(pb)
    # a 1x1 Adam7 image has exactly one non-empty pass (pass 1) of one
    # scanline: filter byte + 3 channel bytes. The hand-built container
    # must now DECODE (the r5 interlace support), not gate.
    ihdr_a7 = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    pa7 = PNG_SIG + _png_chunk(b"IHDR", ihdr_a7) + _png_chunk(
        b"IDAT", zlib.compress(bytes(4))
    ) + _png_chunk(b"IEND", b"")
    assert decode_png(pa7) == (1, 1, 2, [0, 0, 0])
    # an undefined interlace method still fails loudly
    ihdr_bad = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 2)
    pbad = PNG_SIG + _png_chunk(b"IHDR", ihdr_bad) + _png_chunk(
        b"IDAT", zlib.compress(bytes(4))
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(pbad)


def test_palette_png_without_plte_raises():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    p = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(bytes([0, 0]))
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(p)


# --------------------------------------------------------------------------
# Spark-side: genuine containers + oracle parity
# --------------------------------------------------------------------------


def test_generate_media_png_payloads_are_genuine(spark):
    from recon_spark.operators.multimodal import generate_media_png

    rows = generate_media_png(spark, 9).collect()
    assert len(rows) == 9
    for r in rows:
        p = bytes(r["payload"])
        assert p[:8] == PNG_SIG
        assert b"tEXt" in p  # ancillary chunk present, decoder must skip it
        w, h, ct, px = decode_png(p)
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
        assert ct == {0: 2, 1: 6, 2: 3}[r["media_id"] % 3]
        assert len(px) == w * h * (4 if ct == 6 else 3)
        # multi-IDAT: the deflate stream is split into <=48B chunks
        assert p.count(b"IDAT") >= 1


def test_decode_png_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_MULTIMODAL_DECODE_PNG, q_multimodal_decode_png
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_multimodal_decode_png, SQL_MULTIMODAL_DECODE_PNG, SF_ORACLE)


# --------------------------------------------------------------------------
# Adam7 interlace (round 5)
# --------------------------------------------------------------------------


@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.sampled_from([0, 2, 3, 6]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_adam7_decodes_to_same_pixels_as_plain(w, h, ct, seed):
    """Interlacing is pure layout: the seven-pass scatter must decode
    to bit-identical pixels, for every color type and dim shape
    (including dims smaller than a pass's origin, where passes are
    wholly absent per spec)."""
    import hashlib as _h
    import random as _r

    rng = _r.Random(seed)
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ct]
    vals = [rng.randrange(16 if ct == 3 else 256) for _ in range(w * h * ch)]
    pal = ([(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(16)] if ct == 3 else None)
    filters = [rng.randrange(5) for _ in range(h)]
    plain = decode_png(encode_png(w, h, vals, color_type=ct, palette=pal,
                                  filters=filters))
    inter = decode_png(encode_png(w, h, vals, color_type=ct, palette=pal,
                                  filters=filters, interlace=True))
    assert inter == plain
    # the IHDR interlace byte is really set
    p = encode_png(w, h, vals, color_type=ct, palette=pal, interlace=True)
    assert p[8 + 8 + 12] == 1  # sig + len/type of IHDR + 12th payload byte


def test_adam7_pass_structure_is_the_spec_grid():
    """4x4 truecolor: passes 1,2,4,6 contribute 1 scanline each of
    widths 1,0(absent),1,2 and passes 3,5,7 rows — hand-check the byte
    budget: total = sum over non-empty passes of ph*(1+pw*ch)."""
    import zlib as _z

    w = h = 4
    vals = list(range(w * h * 3 * 2))[: w * h * 3]
    vals = [v % 256 for v in vals]
    p = encode_png(w, h, vals, color_type=2, interlace=True)
    # pull the raw scanline stream back out of IDAT
    pos, idat = 8, bytearray()
    while pos < len(p):
        (ln,) = __import__("struct").unpack_from(">I", p, pos)
        ctype = p[pos + 4:pos + 8]
        if ctype == b"IDAT":
            idat += p[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = _z.decompress(bytes(idat))
    # non-empty passes for 4x4: (0,0,8,8)->1x1, (0,4,..) empty, etc.
    expected = 0
    for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                           (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                           (0, 1, 1, 2)):
        pw = len(range(x0, w, dx))
        ph = len(range(y0, h, dy))
        if pw and ph:
            expected += ph * (1 + pw * 3)
    assert len(raw) == expected


def test_generated_interlaced_pngs_flag_and_match(spark):
    from recon_spark.operators.multimodal import generate_media_png

    rows = generate_media_png(spark, 15).collect()
    flagged = [r for r in rows if r["media_id"] % 5 == 2]
    assert flagged
    for r in flagged:
        p = bytes(r["payload"])
        assert p[8 + 8 + 12] == 1  # Adam7 flag set in IHDR
        w, h, ct, px = decode_png(p)
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])


# --------------------------------------------------------------------------
# r5: full spec-legal depth set (1/2/4/8/16)
# --------------------------------------------------------------------------


def test_sub_byte_container_hand_packed_msb_first():
    """5x2 gray at 2 bits/sample, built WITHOUT encode_png: samples
    [0,1,2,3,0 / 3,2,1,0,3] pack MSB-first into ceil(5*2/8)=2 bytes per
    row with the pad bits of the last byte zero (spec §7.2). Row 0
    filter None, row 1 filter Up — at sub-byte depths the filter byte
    distance is 1 BYTE (not one sample), so Up operates on the packed
    bytes of the prior row."""
    row0 = [0, 1, 2, 3, 0]
    row1 = [3, 2, 1, 0, 3]

    def pack2(samples):
        b0 = (samples[0] << 6) | (samples[1] << 4) | (samples[2] << 2) | samples[3]
        b1 = samples[4] << 6  # 6 pad bits, zero
        return bytes([b0, b1])

    p0, p1 = pack2(row0), pack2(row1)
    up = bytes((p1[i] - p0[i]) & 0xFF for i in range(2))
    raw = bytes([0]) + p0 + bytes([2]) + up
    ihdr = struct.pack(">IIBBBBB", 5, 2, 2, 0, 0, 0, 0)
    p = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(raw)
    ) + _png_chunk(b"IEND", b"")
    assert decode_png(p) == (5, 2, 0, row0 + row1)


def test_one_bit_palette_round_trip():
    """1-bit palette (the classic web mask/line-art PNG): two PLTE
    entries, indices pack 8 per byte, decoded pixels de-palettize."""
    pal = [(255, 0, 10), (0, 200, 30)]
    idxs = [1, 0, 0, 1, 1, 1, 0, 1, 0] * 3  # 9x3, non-multiple-of-8 width
    p = encode_png(9, 3, idxs, color_type=3, palette=pal, depth=1)
    w, h, ct, px = decode_png(p)
    assert (w, h, ct) == (9, 3, 3)
    assert px == [c for i in idxs for c in pal[i]]


@given(
    st.sampled_from([(1, 0), (2, 0), (4, 0), (16, 0), (1, 3), (2, 3),
                     (4, 3), (16, 2), (16, 4), (16, 6)]),
    st.integers(1, 11),
    st.integers(1, 7),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_depth_round_trip_property(depth_ct, w, h, interlace, seed):
    """Every non-8-bit spec-legal (depth, color type) combo round-trips
    exactly, plain and Adam7, across random dims/filters/samples —
    including widths whose sub-byte rows end mid-byte."""
    import random as _r

    depth, ct = depth_ct
    rng = _r.Random(seed)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    vals = [rng.randrange(1 << depth) for _ in range(w * h * ch)]
    pal = ([(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(1 << depth)] if ct == 3 else None)
    filters = [rng.randrange(5) for _ in range(h)]
    p = encode_png(w, h, vals, color_type=ct, palette=pal, depth=depth,
                   filters=filters, interlace=interlace)
    gw, gh, gct, px = decode_png(p)
    want = [c for i in vals for c in pal[i]] if ct == 3 else vals
    assert (gw, gh, gct, px) == (w, h, ct, want)


def test_sixteen_bit_filter_distance_is_two_bytes_per_channel():
    """Sub filter at depth 16: bpp = ch*2, so the 'left' byte for a
    truecolor sample is 6 bytes back. A 2x1 RGB image with filter 1 and
    known values pins the distance: second pixel stores deltas against
    the first, byte-wise at offset 6."""
    vals = [0x1234, 0x0001, 0xFFFF, 0x1230, 0x0102, 0x0E0F]
    p = encode_png(2, 1, vals, color_type=2, depth=16, filters=[1])
    # extract the raw scanline and hand-check the filtered bytes
    pos, idat = 8, bytearray()
    while pos < len(p):
        (ln,) = struct.unpack_from(">I", p, pos)
        if p[pos + 4:pos + 8] == b"IDAT":
            idat += p[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    first = struct.pack(">HHH", *vals[:3])
    second = struct.pack(">HHH", *vals[3:])
    want = bytes([1]) + first + bytes((second[i] - first[i]) & 0xFF
                                      for i in range(6))
    assert raw == want
    assert decode_png(p)[3] == vals
