"""Real stdlib TIFF codec (round 5).

Baseline TIFF 6.0 is wheel-free: IFD struct framing (both byte
orders), strip reassembly, and three baseline compressions — none,
PackBits RLE, and TIFF-variant LZW (MSB-first packing, byte alphabet
with CLEAR=256/EOI=257, "early change" width bumps one code before
GIF's rule) — plus the horizontal-differencing predictor.

Spec pinning independent of our encoder:
- PackBits is checked against the worked example in the TIFF 6.0 spec
  (the Apple PackBits reference stream);
- a big-endian container is synthesized by explicit struct writes (our
  encoder only emits little-endian) and must decode identically.
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.multimodal import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_image,
    decode_tiff,
    encode_tiff,
)


# --------------------------------------------------------------------------
# PackBits: pinned to the spec's own worked example
# --------------------------------------------------------------------------


def test_packbits_spec_example():
    """TIFF 6.0 spec, PackBits section: the canonical Apple example.
    Unpacked: AA AA AA 80 00 2A AA AA AA AA 80 00 2A 22 AA AA AA AA AA
    AA AA AA AA AA. Packed: FE AA 02 80 00 2A FD AA 03 80 00 2A 22 F7 AA."""
    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert _packbits_decode(packed, len(unpacked)) == unpacked
    # our encoder must also produce a stream the spec decoder accepts
    ours = _packbits_encode(unpacked)
    assert _packbits_decode(ours, len(unpacked)) == unpacked


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=2000))
def test_packbits_roundtrip_property(data):
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_packbits_noop_byte_and_truncation():
    # 0x80 is a noop per spec
    assert _packbits_decode(b"\x80\x00\x41", 1) == b"A"
    with pytest.raises(ValueError):
        _packbits_decode(b"\x05\x41", 6)  # literal shorter than declared
    with pytest.raises(ValueError):
        _packbits_decode(b"", 3)


# --------------------------------------------------------------------------
# TIFF LZW
# --------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=3000))
def test_tiff_lzw_roundtrip_property(data):
    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data


def test_tiff_lzw_deep_dictionary_and_clear():
    import random

    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(30000))  # forces 4094 CLEAR
    assert _tiff_lzw_decode(_tiff_lzw_encode(data)) == data
    assert _tiff_lzw_decode(_tiff_lzw_encode(b"\x00" * 5000)) == b"\x00" * 5000


def test_tiff_lzw_msb_first_packing():
    """First code is always CLEAR=256 at 9 bits: MSB-first that's
    1_0000_0000 -> first byte 0x80."""
    assert _tiff_lzw_encode(b"")[0] == 0x80


def test_tiff_lzw_truncation_raises():
    with pytest.raises(ValueError):
        _tiff_lzw_decode(b"\x80")  # CLEAR then EOF mid-code


# --------------------------------------------------------------------------
# Container round-trips
# --------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 14),
    samples=st.sampled_from([1, 3]),
    compression=st.sampled_from([1, 5, 32773]),
    predictor=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**32 - 1),
    multi_strip=st.booleans(),
)
def test_tiff_roundtrip_property(w, h, samples, compression, predictor, seed, multi_strip):
    import random

    rng = random.Random(seed)
    vals = [rng.randrange(256) for _ in range(w * h * samples)]
    t = encode_tiff(
        w, h, vals, samples=samples, compression=compression,
        predictor=predictor, rows_per_strip=max(1, h // 3) if multi_strip else None,
    )
    assert decode_tiff(t) == (w, h, samples, vals)


def test_decode_image_dispatches_tiff_for_real():
    vals = list(range(12))
    t = encode_tiff(2, 2, vals, compression=5, predictor=2)
    assert decode_image(t, {}) == vals


def test_big_endian_container_decodes():
    """Synthesize an MM (big-endian) uncompressed 2x1 gray TIFF by raw
    struct writes — our encoder is II-only, so this pins the decoder's
    byte-order handling independently."""
    px = bytes([7, 200])
    ifd_off = 8 + len(px)
    entries = [
        (256, 3, 1, 2 << 16),  # width=2 (SHORT inline: high 16 bits in MM)
        (257, 3, 1, 1 << 16),
        (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (273, 4, 1, 8),
        (277, 3, 1, 1 << 16),
        (278, 4, 1, 1),
        (279, 4, 1, len(px)),
    ]
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off) + px)
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    assert decode_tiff(bytes(out)) == (2, 1, 1, [7, 200])


def test_tiff_gates_and_corruption():
    vals = list(range(27))
    t = encode_tiff(3, 3, vals)
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + t[2:])
    with pytest.raises(ValueError):
        decode_tiff(t[:12])
    # half-tiled container (TileWidth present, no TileOffsets) is invalid
    tiled = bytearray(t)
    at = tiled.index(struct.pack("<HHII", 296, 3, 1, 2))
    tiled[at : at + 12] = struct.pack("<HHII", 322, 3, 1, 16)
    with pytest.raises(ValueError, match="missing required tag"):
        decode_tiff(bytes(tiled))
    # re-tagging an 8-bit image as 16-bit halves the pixel count the
    # strip bytes can cover — the strip is now shorter than its rows
    b16 = bytearray(encode_tiff(3, 3, list(range(9)), samples=1))
    at = b16.index(struct.pack("<HHII", 258, 3, 1, 8))
    b16[at : at + 12] = struct.pack("<HHII", 258, 3, 1, 16)
    with pytest.raises(ValueError, match="shorter"):
        decode_tiff(bytes(b16))
    # remaining honest gates: 12-bit depth and planar TILED layout
    b12 = bytearray(encode_tiff(3, 3, list(range(9)), samples=1))
    at = b12.index(struct.pack("<HHII", 258, 3, 1, 8))
    b12[at : at + 12] = struct.pack("<HHII", 258, 3, 1, 12)
    with pytest.raises(NotImplementedError, match="8/16-bit"):
        decode_tiff(bytes(b12))
    # a chunky container mis-DECLARED planar is corruption, not a gate:
    # the strip count no longer matches samples x strips-per-plane
    planar = bytearray(t)
    at = planar.index(struct.pack("<HHII", 284, 3, 1, 1))
    planar[at : at + 12] = struct.pack("<HHII", 284, 3, 1, 2)
    with pytest.raises(ValueError, match="planar TIFF wants"):
        decode_tiff(bytes(planar))
    # tiled + planar keeps the honest gate
    from recon_spark.operators.multimodal import encode_tiff_tiled

    tp = bytearray(encode_tiff_tiled(8, 8, list(range(192)) + [0] * 0, 3))
    at = tp.index(struct.pack("<HHII", 284, 3, 1, 1))
    tp[at : at + 12] = struct.pack("<HHII", 284, 3, 1, 2)
    with pytest.raises(NotImplementedError, match="tiled planar"):
        decode_tiff(bytes(tp))


# --------------------------------------------------------------------------
# PlanarConfiguration 2 (separate component planes) — round 5
# --------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    comp=st.sampled_from([1, 5, 32773, 8]),
    pred=st.sampled_from([1, 2]),
    rps=st.sampled_from([None, 2]),
    bits=st.sampled_from([8, 16]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_planar_roundtrip_matches_chunky(w, h, comp, pred, rps, bits, data):
    """A PlanarConfiguration=2 encoding of ANY image decodes to exactly
    the values of its chunky twin — plane split/reassembly, per-plane
    predictor, and multi-strip planes are pure container concerns."""
    if pred == 2 and comp == 1:
        comp = 5  # predictor rides a compression per spec
    mx = (1 << bits) - 1
    vals = data.draw(
        st.lists(st.integers(min_value=0, max_value=mx),
                 min_size=w * h * 3, max_size=w * h * 3)
    )
    from recon_spark.operators.multimodal import encode_tiff_planar

    planar = decode_tiff(encode_tiff_planar(w, h, vals, 3, comp, pred, rps, bits))
    chunky = decode_tiff(encode_tiff(w, h, vals, 3, comp, pred, rps, bits))
    assert planar == (w, h, 3, vals)
    assert planar == chunky


def test_planar_big_endian_hand_built():
    """Hand-assembled BIG-endian planar container: 2x2 RGB, one strip
    per plane, uncompressed — locks byte order + plane order without
    the encoder in the loop."""
    w, h = 2, 2
    planes = [bytes([10, 20, 30, 40]), bytes([1, 2, 3, 4]),
              bytes([200, 210, 220, 230])]
    out = bytearray(b"MM\x00*")
    out += struct.pack(">I", 8 + 12)  # IFD after header + strip data
    offs = []
    for pl in planes:
        offs.append(len(out))
        out += pl
    def entry(tag, typ, cnt, val):
        return struct.pack(">HHII", tag, typ, cnt, val)
    def entry_s(tag, cnt, val):  # SHORT value: left-justified per spec
        return struct.pack(">HHIHH", tag, 3, cnt, val, 0)
    ifd_off = len(out)
    extra_base = ifd_off + 2 + 12 * 9 + 4
    entries = [
        entry(256, 4, 1, w), entry(257, 4, 1, h),
        entry(258, 3, 3, extra_base),  # triple lives after the IFD
        entry_s(259, 1, 1), entry_s(262, 1, 2),
        entry(273, 4, 3, extra_base + 8),
        entry_s(277, 1, 3), entry_s(284, 1, 2),
        entry(279, 4, 3, extra_base + 20),
    ]
    out += struct.pack(">H", len(entries)) + b"".join(sorted(entries))
    out += struct.pack(">I", 0)
    out += struct.pack(">HHH", 8, 8, 8) + b"\x00\x00"
    out += struct.pack(">III", *offs)
    out += struct.pack(">III", 4, 4, 4)
    got = decode_tiff(bytes(out))
    want = [0] * 12
    for p in range(3):
        want[p::3] = list(planes[p])
    assert got == (w, h, 3, want)


# --------------------------------------------------------------------------
# Spark-side: genuine containers + oracle parity
# --------------------------------------------------------------------------


def test_generate_media_tiff_payloads_are_genuine(spark):
    from recon_spark.operators.multimodal import generate_media_tiff

    rows = generate_media_tiff(spark, 9).collect()
    assert len(rows) == 9
    for r in rows:
        p = bytes(r["payload"])
        assert p[:4] == b"II*\x00"
        w, h, spp, px = decode_tiff(p)
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
        assert spp == (1 if r["media_id"] % 3 == 2 else 3)
        assert len(px) == w * h * spp
        # every other LZW-class container must really be planar —
        # tag 284 value 2 in the (little-endian, SHORT) IFD entry
        is_planar = struct.pack("<HHIHH", 284, 3, 1, 2, 0) in p
        assert is_planar == (r["media_id"] % 6 == 0)


def test_decode_tiff_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_MULTIMODAL_DECODE_TIFF, q_multimodal_decode_tiff
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_multimodal_decode_tiff, SQL_MULTIMODAL_DECODE_TIFF, SF_ORACLE)


# --------------------------------------------------------------------------
# r5: multi-page IFD chain
# --------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    npages=st.integers(1, 5),
    seed=st.integers(0, 2**32 - 1),
)
def test_multi_page_chain_round_trip(npages, seed):
    """Every page of a chained-IFD TIFF round-trips — per-page dims,
    gray/RGB mix, all three compressions, predictor, multi-strip — and
    decode_tiff returns the first page (poster semantics)."""
    import random

    from recon_spark.operators.multimodal import (
        decode_tiff_pages,
        encode_tiff_multi,
    )

    rng = random.Random(seed)
    spec, want = [], []
    for _ in range(npages):
        w, h = rng.randrange(1, 12), rng.randrange(1, 10)
        s = rng.choice([1, 3])
        comp = rng.choice([1, 5, 32773])
        pred = rng.choice([1, 2]) if comp != 1 else 1
        rps = rng.choice([None, 1, 2, 3])
        vals = [rng.randrange(256) for _ in range(w * h * s)]
        spec.append((w, h, vals, s, comp, pred, rps))
        want.append((w, h, s, vals))
    p = encode_tiff_multi(spec)
    assert decode_tiff_pages(p) == want
    assert decode_tiff(p) == want[0]


def test_ifd_cycle_and_page_cap_raise():
    import struct as _struct

    from recon_spark.operators.multimodal import (
        decode_tiff_pages,
        encode_tiff_multi,
    )

    p = bytearray(encode_tiff_multi(
        [(2, 2, [1] * 4, 1, 1, 1, None), (2, 2, [2] * 4, 1, 1, 1, None)]))
    (ifd0,) = _struct.unpack_from("<I", p, 4)
    (n0,) = _struct.unpack_from("<H", p, ifd0)
    _struct.pack_into("<I", p, ifd0 + 2 + 12 * n0, ifd0)  # self-loop
    with pytest.raises(ValueError, match="loops|page cap"):
        decode_tiff_pages(bytes(p))
    with pytest.raises(ValueError, match="loops|page cap"):
        decode_tiff_pages(encode_tiff_multi(
            [(1, 1, [0], 1, 1, 1, None)] * 3), max_pages=2)


# --------------------------------------------------------------------------
# r5: tiled layout (§15) + 16-bit depth
# --------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 35),
    samples=st.sampled_from([1, 3]),
    comp_pred=st.sampled_from([(1, 1), (5, 1), (5, 2), (32773, 1), (32773, 2)]),
    tile=st.sampled_from([(16, 16), (8, 8), (16, 8)]),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiled_round_trip(w, h, samples, comp_pred, tile, bits, seed):
    """Tiled containers round-trip across compression x predictor x
    depth x tile grid — including edge tiles whose padding must be
    discarded and predictor runs over the PADDED tile width."""
    import random

    from recon_spark.operators.multimodal import encode_tiff_tiled

    comp, pred = comp_pred
    rng = random.Random(seed)
    vals = [rng.randrange(1 << bits) for _ in range(w * h * samples)]
    p = encode_tiff_tiled(w, h, vals, samples, comp, pred, *tile, bits)
    assert decode_tiff(p) == (w, h, samples, vals)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    samples=st.sampled_from([1, 3]),
    comp_pred=st.sampled_from([(1, 1), (5, 2), (32773, 2)]),
    rps=st.sampled_from([None, 1, 3]),
    seed=st.integers(0, 2**32 - 1),
)
def test_16bit_strip_round_trip(w, h, samples, comp_pred, rps, seed):
    """16-bit strips round-trip — values near 65535 exercise the
    predictor's mod-2^16 wraparound."""
    import random

    comp, pred = comp_pred
    rng = random.Random(seed)
    vals = [
        rng.choice([rng.randrange(65536), 65535, 0])
        for _ in range(w * h * samples)
    ]
    p = encode_tiff(w, h, vals, samples, comp, pred, rps, bits=16)
    assert decode_tiff(p) == (w, h, samples, vals)


def test_16bit_big_endian_hand_built():
    """Hand-assembled big-endian (MM) 16-bit gray 2x1: samples are
    big-endian SHORTs in strip data, IFD values in MM layout."""
    px = struct.pack(">HH", 300, 65535)
    ifd_off = 8 + len(px)
    entries = [
        (256, 3, 1, 2 << 16),  # width=2 (SHORT inline: high 16 bits in MM)
        (257, 3, 1, 1 << 16),
        (258, 3, 1, 16 << 16),
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (273, 4, 1, 8),
        (277, 3, 1, 1 << 16),
        (278, 4, 1, 1),
        (279, 4, 1, len(px)),
    ]
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off) + px)
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    assert decode_tiff(bytes(out)) == (2, 1, 1, [300, 65535])


def test_tile_grid_mismatch_raises():
    from recon_spark.operators.multimodal import encode_tiff_tiled

    p = bytearray(encode_tiff_tiled(20, 20, [1] * 400, 1, 1, 1, 16, 16))
    # shrink TileWidth to 8: grid becomes 3x2=6 tiles but only 4 offsets
    at = p.index(struct.pack("<HHII", 322, 4, 1, 16))
    p[at : at + 12] = struct.pack("<HHII", 322, 4, 1, 8)
    with pytest.raises(ValueError, match="tile offset/count mismatch"):
        decode_tiff(bytes(p))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 16),
    samples=st.sampled_from([1, 3]),
    comp=st.sampled_from([8, 32946]),
    pred=st.sampled_from([1, 2]),
    bits=st.sampled_from([8, 16]),
    tiled=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_deflate_round_trip(w, h, samples, comp, pred, bits, tiled, seed):
    """Deflate compression (TIFF-TN2 code 8 + legacy Adobe 32946) is a
    zlib stream per strip/tile — the most common real-crawl TIFF
    compression after LZW; corrupt streams raise ValueError."""
    import random

    from recon_spark.operators.multimodal import encode_tiff_tiled

    rng = random.Random(seed)
    vals = [rng.randrange(1 << bits) for _ in range(w * h * samples)]
    if tiled:
        p = encode_tiff_tiled(w, h, vals, samples, comp, pred, 8, 8, bits)
    else:
        p = encode_tiff(w, h, vals, samples, comp, pred, 2, bits)
    assert decode_tiff(p) == (w, h, samples, vals)


def test_deflate_corrupt_stream_raises_valueerror():
    p = bytearray(encode_tiff(4, 4, list(range(16)), samples=1, compression=8))
    # strip data starts at offset 8; smash the zlib header
    p[8] ^= 0xFF
    with pytest.raises(ValueError, match="Deflate"):
        decode_tiff(bytes(p))
