"""Real stdlib JPEG codec (round 5).

Baseline sequential-DCT JPEG (ITU-T T.81) is wheel-free too: marker
framing, canonical Huffman entropy coding over DC-size / AC-(run,size)
symbols with 0xFF byte stuffing, zigzag + quantization, and the 8x8
type-II DCT. The encoder optimizes its Huffman tables from the scan's
real symbol frequencies (libjpeg-style), so no Annex K constants are
baked in and the decoder reads ANY baseline table from DHT.

What pins correctness independent of our encoder:
- a JPEG is hand-assembled byte-by-byte with hand-chosen Huffman
  tables and hand-packed scan bits, and must decode to the hand-
  computed pixels (locks marker parse, DHT canonical assignment,
  entropy decode, dequant, and IDCT against the spec, not against
  encode_jpeg);
- the entropy layer round-trips arbitrary coefficient blocks EXACTLY
  (Huffman + value categories are lossless);
- the documented exactness contract: all-ones quant tables +
  per-8x8-block-constant pixels decode bit-exactly, including on dims
  that are not multiples of 8 (edge-padded partial blocks) and through
  the defined YCbCr color round trip.
"""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.multimodal import (
    _JPEG_ZZ,
    _JpegBitReader,
    _JpegBitWriter,
    _build_huffman,
    _emit_block,
    _huff_codes,
    _huff_decode_map,
    _read_block,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_image,
    decode_jpeg,
    encode_jpeg,
)


# --------------------------------------------------------------------------
# zigzag + Huffman construction
# --------------------------------------------------------------------------


def test_zigzag_is_the_t81_scan():
    assert sorted(_JPEG_ZZ) == list(range(64))
    # the famous prefix, straight from the spec figure
    assert _JPEG_ZZ[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert _JPEG_ZZ[-4:] == [47, 55, 62, 63]


@given(
    st.dictionaries(
        st.integers(0, 255), st.integers(1, 10_000), min_size=1, max_size=200
    )
)
@settings(max_examples=60, deadline=None)
def test_huffman_tables_are_valid_and_decodable(freq):
    bits, huffval = _build_huffman(freq)
    assert len(bits) == 17 and bits[0] == 0
    assert sum(bits[1:]) == len(freq) == len(huffval)
    assert set(huffval) == set(freq)
    codes = _huff_codes(bits, huffval)
    # prefix-free: no code is a prefix of another
    as_bits = {s: format(c, f"0{ln}b") for s, (c, ln) in codes.items()}
    vals = sorted(as_bits.values())
    for a, b in zip(vals, vals[1:]):
        assert not b.startswith(a), (a, b)
    # all lengths legal, and the all-ones code of the max length unused
    # (T.81 requires it stays free so padding bits can't decode)
    maxlen = max(ln for _, ln in codes.values())
    assert maxlen <= 16
    assert "1" * maxlen not in as_bits.values()
    # decode map inverts the code assignment
    m = _huff_decode_map(bits, huffval)
    for s, (c, ln) in codes.items():
        assert m[(ln, c)] == s


def test_huffman_single_symbol_gets_one_bit():
    bits, huffval = _build_huffman({0: 1000})
    assert bits[1] == 1 and huffval == [0]
    assert _huff_codes(bits, huffval)[0] == (0, 1)


# --------------------------------------------------------------------------
# entropy layer: exact coefficient round trip (lossless by construction)
# --------------------------------------------------------------------------

_coef = st.integers(-1023, 1023)
_block = st.lists(_coef, min_size=64, max_size=64)


@given(st.lists(_block, min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_entropy_coefficient_roundtrip_exact(blocks):
    # DC values must stay inside the 8-bit category range (diff <= 2047);
    # coefficients here are in [-1023, 1023] so diffs are in [-2046, 2046]
    dcf, acf = {}, {}
    pred = 0
    for b in blocks:
        pred = _emit_block(None, b, pred, {}, {}, freq_only=(dcf, acf))
    db, dv = _build_huffman(dcf)
    ab, av = _build_huffman(acf)
    dc_codes, ac_codes = _huff_codes(db, dv), _huff_codes(ab, av)
    w = _JpegBitWriter()
    pred = 0
    for b in blocks:
        pred = _emit_block(w, b, pred, dc_codes, ac_codes)
    data = w.flush()
    r = _JpegBitReader(data, 0)
    dm, am = _huff_decode_map(db, dv), _huff_decode_map(ab, av)
    pred = 0
    for b in blocks:
        got, pred = _read_block(r, pred, dm, am)
        assert got == b


def test_bitwriter_stuffs_ff():
    w = _JpegBitWriter()
    w.write(0xFF, 8)
    w.write(0xAB, 8)
    assert w.flush() == b"\xff\x00\xab"
    r = _JpegBitReader(b"\xff\x00\xab", 0)
    assert r.read(8) == 0xFF and r.read(8) == 0xAB


# --------------------------------------------------------------------------
# hand-assembled container (decoder pinned to the spec, not the encoder)
# --------------------------------------------------------------------------


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def test_hand_assembled_jpeg_decodes():
    """8x8 gray, all-ones qtable. DC Huffman: one 1-bit code '0' for
    size 7; AC Huffman: one 1-bit code '0' for EOB. Scan encodes the
    single block with DC diff 80 (pixel constant 138: 8*(138-128) = 80,
    category 7, bits 1010000) then EOB: 0 1010000 0 + 7 pad 1-bits =
    0x50 0x7F. Every byte below is written by hand."""
    qt = bytes([0]) + bytes([1] * 64)
    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([7])
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sof = bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    jpg = (
        b"\xff\xd8"
        + _seg(0xDB, qt)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
        + bytes([0x50, 0x7F])
        + b"\xff\xd9"
    )
    w, h, nc, px = decode_jpeg(jpg)
    assert (w, h, nc) == (8, 8, 1)
    assert px == [138] * 64


# --------------------------------------------------------------------------
# the exactness contract (what the oracle relies on)
# --------------------------------------------------------------------------


@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_block_constant_gray_roundtrip_exact(w, h, seed):
    d = hashlib.sha256(str(seed).encode()).digest()
    vals = [d[((x // 8) + 2 * (y // 8) + 5) % 32] for y in range(h) for x in range(w)]
    got = decode_jpeg(encode_jpeg(w, h, vals))
    assert got == (w, h, 1, vals)


@given(st.integers(1, 18), st.integers(1, 14), st.integers(0, 2**32 - 1))
@settings(max_examples=25, deadline=None)
def test_block_constant_color_roundtrip_matches_defined_transform(w, h, seed):
    import numpy as np

    d = hashlib.sha256(str(seed).encode()).digest()
    rgb = []
    for y in range(h):
        for x in range(w):
            k = (x // 8) + 2 * (y // 8)
            rgb += [d[k % 32], d[(k + 7) % 32], d[(k + 13) % 32]]
    gw, gh, gnc, gpx = decode_jpeg(encode_jpeg(w, h, rgb, samples=3))
    yy, cb, cr = _rgb_to_ycbcr(np.asarray(rgb, float).reshape(h, w, 3))
    r2, g2, b2 = _ycbcr_to_rgb(yy, cb, cr)
    exp = [int(v) for v in np.stack([r2, g2, b2], -1).reshape(-1)]
    assert (gw, gh, gnc) == (w, h, 3) and gpx == exp


@given(st.integers(0, 2**32 - 1), st.integers(9, 24), st.integers(9, 24))
@settings(max_examples=20, deadline=None)
def test_arbitrary_image_all_ones_qtable_error_bounded(seed, w, h):
    """Full-pipeline lossiness with q=1 is only the DCT-coefficient
    rounding (each |err| <= 0.5): pixel error stays tiny. A zigzag,
    quant, or IDCT bug produces errors of tens to hundreds."""
    import numpy as np

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=w * h).tolist()
    _, _, _, px = decode_jpeg(encode_jpeg(w, h, img))
    assert max(abs(a - b) for a, b in zip(px, img)) <= 3


def test_lossy_quant_table_roundtrip_compresses_and_bounds():
    import numpy as np

    rng = np.random.default_rng(11)
    # smooth gradient + mild noise: the case lossy JPEG is built for
    img = [
        int(np.clip(100 + 3 * x + 2 * y + rng.integers(-4, 5), 0, 255))
        for y in range(24)
        for x in range(24)
    ]
    p = encode_jpeg(24, 24, img, qtable=[16] * 64)
    _, _, _, px = decode_jpeg(p)
    assert max(abs(a - b) for a, b in zip(px, img)) <= 24
    assert len(p) < len(encode_jpeg(24, 24, img))  # coarser table -> smaller


def test_pinned_golden_payload_and_decode():
    """Self-golden: the byte stream and its decode are pinned so any
    cross-version drift in numpy/hashlib/our code is caught."""
    vals = [((x // 8) * 40 + (y // 8) * 90 + 37) % 256 for y in range(11) for x in range(13)]
    p = encode_jpeg(13, 11, vals)
    assert decode_jpeg(p) == (13, 11, 1, vals)
    assert hashlib.sha256(p).hexdigest() == PINNED_GOLDEN_SHA256


PINNED_GOLDEN_SHA256 = (
    "5516b5f231d323763f619b538b2bb68ec402ad4c5069b6f1ba759a37b6c9c811"
)


# --------------------------------------------------------------------------
# subsampling + restart intervals (the layouts real crawl JPEGs use)
# --------------------------------------------------------------------------


@given(st.integers(0, 2**32 - 1), st.integers(9, 40), st.integers(9, 40),
       st.sampled_from([0, 1, 2, 3]))
@settings(max_examples=25, deadline=None)
def test_restart_intervals_do_not_change_pixels(seed, w, h, ri):
    """RSTn framing is pure entropy-layer structure: byte re-align +
    DC predictor reset. Decoded pixels must be bit-identical to the
    unrestarted encoding of the same image."""
    import numpy as np

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=w * h).tolist()
    base = decode_jpeg(encode_jpeg(w, h, img))
    assert decode_jpeg(encode_jpeg(w, h, img, restart_interval=ri)) == base


@given(st.integers(1, 36), st.integers(1, 36), st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_420_macro_block_constant_roundtrip_exact(w, h, seed):
    """16x16-aligned constants survive 4:2:0 exactly: the 2x2 chroma
    box average of a constant is the constant, replication upsample
    inverts it, and edge padding replicates it — so decode equals the
    defined YCbCr round trip bit-for-bit, restarts included."""
    import numpy as np

    d = hashlib.sha256(str(seed).encode()).digest()
    rgb = []
    for y in range(h):
        for x in range(w):
            k = (x // 16) + 2 * (y // 16)
            rgb += [d[k % 32], d[(k + 7) % 32], d[(k + 13) % 32]]
    got = decode_jpeg(encode_jpeg(w, h, rgb, samples=3, subsample="420",
                                  restart_interval=2))
    yy, cb, cr = _rgb_to_ycbcr(np.asarray(rgb, float).reshape(h, w, 3))
    r2, g2, b2 = _ycbcr_to_rgb(yy, cb, cr)
    exp = [int(v) for v in np.stack([r2, g2, b2], -1).reshape(-1)]
    assert got == (w, h, 3, exp)


@given(st.integers(1, 36), st.integers(1, 20), st.integers(0, 2**32 - 1))
@settings(max_examples=15, deadline=None)
def test_422_aligned_constant_roundtrip_exact(w, h, seed):
    import numpy as np

    d = hashlib.sha256(str(seed).encode()).digest()
    rgb = []
    for y in range(h):
        for x in range(w):
            k = (x // 16) + 2 * (y // 8)
            rgb += [d[k % 32], d[(k + 7) % 32], d[(k + 13) % 32]]
    got = decode_jpeg(encode_jpeg(w, h, rgb, samples=3, subsample="422"))
    yy, cb, cr = _rgb_to_ycbcr(np.asarray(rgb, float).reshape(h, w, 3))
    r2, g2, b2 = _ycbcr_to_rgb(yy, cb, cr)
    exp = [int(v) for v in np.stack([r2, g2, b2], -1).reshape(-1)]
    assert got == (w, h, 3, exp)


@given(st.integers(0, 2**32 - 1), st.integers(9, 30), st.integers(9, 30))
@settings(max_examples=15, deadline=None)
def test_gray_content_through_420_error_bounded(seed, w, h):
    """r=g=b content has constant chroma (cb=cr=128 exactly under the
    defined transform), so 4:2:0's chroma loss vanishes and the error
    bound equals the grayscale pipeline's."""
    import numpy as np

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=w * h).tolist()
    rgb = [c for v in img for c in (v, v, v)]
    _, _, _, px = decode_jpeg(encode_jpeg(w, h, rgb, samples=3, subsample="420"))
    assert max(abs(a - b) for a, b in zip(px, rgb)) <= 3


def test_corrupt_restart_marker_raises():
    img = [7] * (32 * 16)
    p = encode_jpeg(32, 16, img, restart_interval=1)
    rst_at = p.index(b"\xff\xd0")
    bad = p[:rst_at] + b"\xff\xd5" + p[rst_at + 2:]  # wrong RST number
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bad)


# --------------------------------------------------------------------------
# gates + malformed containers
# --------------------------------------------------------------------------


def test_gates_and_corruption():
    good = encode_jpeg(8, 8, [9] * 64)
    # swapping SOF0 (FFC0) for SOF2 (FFC2) yields a structurally
    # progressive frame whose scan header (Ss=0, Se=63) is illegal for
    # progressive mode — the decoder (which DOES decode genuine
    # progressive JPEGs, tests/test_jpeg_progressive.py) must reject
    # the frankenstein container loudly, not misparse it
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="spectral band"):
        decode_jpeg(prog)
    # a DRI announcing restarts the scan doesn't contain: the decoder
    # must fail loudly at the missing RST marker, not misparse
    twoblk = encode_jpeg(16, 8, [9] * 128)
    sos_at = twoblk.index(b"\xff\xda")
    dri = twoblk[:sos_at] + _seg(0xDD, b"\x00\x01") + twoblk[sos_at:]
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(dri)
    # sampling factors beyond 2 (4:1:1-class layouts) stay gated
    color = encode_jpeg(8, 8, [9, 8, 7] * 64, samples=3)
    sub = color.replace(bytes([1, 0x11, 0]), bytes([1, 0x33, 0]), 1)
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(sub)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"NOPE" + good)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated mid-structure
    with pytest.raises(NotImplementedError):
        encode_jpeg(4, 4, [1] * 32, samples=2)


def test_decode_image_dispatches_jpeg_for_real():
    vals = [200] * 64
    px = decode_image(encode_jpeg(8, 8, vals), {}, fake=False)
    assert px == vals


# --------------------------------------------------------------------------
# generator + oracle query
# --------------------------------------------------------------------------


def test_generate_media_jpeg_payloads_are_genuine(spark):
    from recon_spark.operators.multimodal import generate_media_jpeg

    rows = generate_media_jpeg(spark, 12).collect()
    assert len(rows) == 12
    for r in rows:
        p = bytes(r["payload"])
        assert p[:3] == b"\xff\xd8\xff" and p[-2:] == b"\xff\xd9"
        w, h, nc, px = decode_jpeg(p)
        assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
        assert nc == (3 if r["media_id"] % 4 in (1, 3) else 1)
        assert len(px) == w * h * nc
        if r["media_id"] % 4 == 3:  # the 4:2:0 class really carries DRI,
            # and RST0 whenever the image spans more than one interval
            assert b"\xff\xdd" in p
            n_mcus = -(-w // 16) * -(-h // 16)
            if n_mcus > 2:
                assert b"\xff\xd0" in p


def test_decode_jpeg_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_MULTIMODAL_DECODE_JPEG, q_multimodal_decode_jpeg
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_multimodal_decode_jpeg, SQL_MULTIMODAL_DECODE_JPEG, SF_ORACLE)
