"""FLAC codec (round 5, RFC 9639).

Pinning strategy, mirroring the other codec suites:
- the CRC polynomials are pinned to PUBLISHED check values ("123456789"
  -> 0xF4 for CRC-8/0x07, 0xFEE8 for CRC-16/0x8005-init-0), independent
  of our implementation;
- a container is HAND-ASSEMBLED byte by byte (STREAMINFO fields packed
  by hand, frame header literals, verbatim subframe) and must decode to
  the literal samples — the decoder never sees our encoder's output;
- an LPC order-1 subframe is hand-packed field by field (precision,
  shift, coefficient, Rice residual bits) — a layout our encoder never
  emits (it only uses LPC order 2), so the LPC read path is pinned
  independently;
- hypothesis round-trips sweep depth x channels x stereo mode x
  subframe policy x partition order x Rice method x escape;
- every corruption (flipped frame byte, flipped MD5, truncation, bad
  magic) must raise ValueError, never return wrong samples.
"""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.flac import (
    BitReader,
    BitWriter,
    _decode_subframe,
    _encode_subframe,
    _track_spec,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    first_frame_channel_mode,
    parse_streaminfo,
    utf8_num_decode,
    utf8_num_encode,
)

# --------------------------------------------------------------------------
# CRC pinning: published check values, not self-referential
# --------------------------------------------------------------------------


def test_crc8_published_check_value():
    # CRC-8/SMBUS: poly 0x07, init 0, no reflection -> check 0xF4
    assert crc8(b"123456789") == 0xF4
    assert crc8(b"") == 0


def test_crc16_published_check_value():
    # CRC-16/UMTS (a.k.a. BUYPASS): poly 0x8005, init 0, no reflection
    assert crc16(b"123456789") == 0xFEE8
    assert crc16(b"") == 0


# --------------------------------------------------------------------------
# Coded (UTF-8-style) numbers: full 36-bit range
# --------------------------------------------------------------------------


def test_utf8_num_known_encodings():
    assert utf8_num_encode(0) == b"\x00"
    assert utf8_num_encode(0x7F) == b"\x7F"
    # 0x80 needs two bytes, standard UTF-8 form
    assert utf8_num_encode(0x80) == b"\xC2\x80"
    # the 36-bit maximum needs the 7-byte extended form
    assert utf8_num_encode((1 << 36) - 1)[0] == 0xFE
    with pytest.raises(ValueError):
        utf8_num_encode(1 << 36)


@given(st.integers(min_value=0, max_value=(1 << 36) - 1))
@settings(max_examples=200, deadline=None)
def test_utf8_num_round_trip(n):
    enc = utf8_num_encode(n)
    assert utf8_num_decode(BitReader(enc)) == n


def test_utf8_num_rejects_bad_continuation():
    with pytest.raises(ValueError):
        utf8_num_decode(BitReader(b"\xC2\x00"))
    with pytest.raises(ValueError):
        utf8_num_decode(BitReader(b"\x80"))  # bare continuation byte


# --------------------------------------------------------------------------
# Hand-assembled container: decoder pinned without touching the encoder
# --------------------------------------------------------------------------


def _hand_container() -> tuple[bytes, list[int]]:
    """Mono, 8-bit, sr 8000, 4 samples [10, -3, 7, 7], one VERBATIM
    frame. Every byte below is derived by hand from RFC 9639 (the CRC
    bytes are computed, but over hand-laid-out input)."""
    samples = [10, -3, 7, 7]
    md5 = hashlib.md5(bytes([0x0A, 0xFD, 0x07, 0x07])).digest()
    streaminfo = bytes(
        [0x00, 0x04,              # min block size 4
         0x00, 0x04,              # max block size 4
         0x00, 0x00, 0x00,        # min frame size (unknown)
         0x00, 0x00, 0x00,        # max frame size (unknown)
         # sr=8000 (20b) | channels-1=0 (3b) | bps-1=7 (5b) | total=4 (36b)
         0x01, 0xF4, 0x00, 0x70, 0x00, 0x00, 0x00, 0x04]
    ) + md5
    meta = b"\x80" + len(streaminfo).to_bytes(3, "big") + streaminfo
    hdr = bytes(
        [0xFF, 0xF8,  # sync 11111111111110 | reserved 0 | fixed blocking
         0x60,        # block size code 0110 (8-bit at end) | sr code 0000
         0x02,        # channels 0000 | sample size 001 (8-bit) | reserved
         0x00,        # coded frame number 0
         0x03]        # block size - 1
    )
    frame = hdr + bytes([crc8(hdr)])
    frame += bytes([0x02])                    # subframe: 0|000001|0 VERBATIM
    frame += bytes([0x0A, 0xFD, 0x07, 0x07])  # the four signed samples
    frame += crc16(frame).to_bytes(2, "big")
    return b"fLaC" + meta + frame, samples


def test_hand_assembled_container_decodes():
    payload, samples = _hand_container()
    sr, bps, chans = decode_flac(payload)
    assert (sr, bps) == (8000, 8)
    assert chans == [samples]


def test_streaminfo_fields_parse():
    payload, _ = _hand_container()
    info = parse_streaminfo(payload)
    assert info["min_block"] == info["max_block"] == 4
    assert info["sample_rate"] == 8000
    assert info["channels"] == 1 and info["bps"] == 8
    assert info["total_samples"] == 4


def test_hand_packed_lpc_order1_subframe():
    """LPC order 1, coef [2], shift 1 -> pred = a[i-1]; our encoder
    never emits this layout, so the LPC field reads are pinned here."""
    w = BitWriter()
    w.write(0, 1)        # subframe pad bit
    w.write(32 + 0, 6)   # LPC, order (0)+1 = 1
    w.write(0, 1)        # no wasted bits
    w.write_signed(3, 8)  # warmup sample
    w.write(4 - 1, 4)    # precision-1
    w.write_signed(1, 5)  # shift
    w.write_signed(2, 4)  # coefficient
    w.write(0, 2)        # residual method 0 (4-bit Rice)
    w.write(0, 4)        # partition order 0
    w.write(1, 4)        # Rice parameter k=1
    # residuals [2, -1, 0] -> zigzag [4, 1, 0] -> (q, rem): (2,0) (0,1) (0,0)
    w.write(0b001, 3)
    w.write(0, 1)
    w.write(1, 1)
    w.write(1, 1)
    w.write(1, 1)
    w.write(0, 1)
    w.align()
    out = _decode_subframe(BitReader(w.bytes()), 4, 8)
    assert out == [3, 5, 4, 4]


def test_hand_packed_escape_partition():
    """Escape partition: param 1111, 5-bit raw width, two's-complement
    raw residuals (FIXED order 0 so residuals ARE the samples)."""
    w = BitWriter()
    w.write(0, 1)
    w.write(8, 6)   # FIXED order 0
    w.write(0, 1)
    w.write(0, 2)   # method 0
    w.write(0, 4)   # partition order 0
    w.write(15, 4)  # escape
    w.write(4, 5)   # raw width 4 bits
    for v in (5, -6, 0, 7):
        w.write_signed(v, 4)
    w.align()
    assert _decode_subframe(BitReader(w.bytes()), 4, 8) == [5, -6, 0, 7]


def test_hand_packed_wasted_bits():
    """Wasted-bits flag + unary count: CONSTANT value shifted back up."""
    w = BitWriter()
    w.write(0, 1)
    w.write(0, 6)   # CONSTANT
    w.write(1, 1)   # wasted-bits flag
    w.write(0b01, 2)  # unary: one 0 then stop 1 -> wasted = 2
    w.write_signed(3, 6)  # effective depth 8-2
    w.align()
    assert _decode_subframe(BitReader(w.bytes()), 3, 8) == [12, 12, 12]


# --------------------------------------------------------------------------
# Encoder wasted-bit detection (decoded through the subframe reader)
# --------------------------------------------------------------------------


def test_encoder_detects_wasted_bits():
    samples = [40, -24, 16, 8, 120, -64, 32, 56]  # all multiples of 8
    w = BitWriter()
    _encode_subframe(w, samples, 16, sel=0, po=0, rice2=False, force_escape=False)
    w.align()
    r = BitReader(w.bytes())
    assert r.read(1) == 0
    r.read(6)
    assert r.read(1) == 1, "wasted-bits flag must be set"
    assert _decode_subframe(BitReader(w.bytes()), len(samples), 16) == samples


def test_escape_width_zero_all_zero_residuals():
    # a perfect linear ramp has zero FIXED-2 residuals -> escape width 0
    ramp = [3 + 5 * j for j in range(12)]
    p = encode_flac(8000, 16, [ramp], block_size=12, type_sel=2,
                    force_escape=True)
    assert decode_flac(p)[2] == [ramp]


# --------------------------------------------------------------------------
# Round-trip sweeps
# --------------------------------------------------------------------------


@given(
    st.integers(min_value=0, max_value=3),   # stereo mode
    st.integers(min_value=0, max_value=3),   # type_sel base
    st.integers(min_value=0, max_value=2),   # partition order
    st.booleans(),                            # rice2
    st.booleans(),                            # force_escape
    st.integers(min_value=0, max_value=2**31 - 1),  # sample seed
)
@settings(max_examples=60, deadline=None)
def test_stereo_16bit_round_trip(mode, sel, po, rice2, esc, seed):
    import random

    rng = random.Random(seed)
    n = rng.randrange(18, 50)
    chans = [[rng.randrange(-32768, 32768) for _ in range(n)] for _ in range(2)]
    stereo = ["independent", "left_side", "right_side", "mid_side"][mode]
    p = encode_flac(44100, 16, chans, block_size=16, stereo_mode=stereo,
                    type_sel=sel, partition_order=po, rice2=rice2,
                    force_escape=esc)
    sr, bps, out = decode_flac(p)
    assert (sr, bps) == (44100, 16)
    assert out == chans
    assert first_frame_channel_mode(p) == stereo


@given(st.lists(st.integers(min_value=-128, max_value=127), min_size=1,
                max_size=80),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=60, deadline=None)
def test_mono_8bit_round_trip(samples, sel):
    p = encode_flac(8000, 8, [samples], block_size=16, type_sel=sel)
    assert decode_flac(p)[2] == [samples]


def test_side_channel_extremes():
    # L-R spans the full 17-bit side range: the +1-depth path must hold
    L = [32767, -32768, 32767, -32768, 0, 1, -1, 2]
    R = [-32768, 32767, -32768, 32767, 0, -1, 1, -2]
    for mode in ("left_side", "right_side", "mid_side"):
        p = encode_flac(16000, 16, [L, R], block_size=8, stereo_mode=mode)
        assert decode_flac(p)[2] == [L, R], mode


def test_multi_frame_and_short_final_block():
    chans = [list(range(-20, 25))]  # 45 samples -> 16+16+13
    p = encode_flac(22050, 16, chans, block_size=16, type_sel=1)
    assert decode_flac(p)[2] == chans


# --------------------------------------------------------------------------
# Corruption: wrong bytes must raise, never return wrong samples
# --------------------------------------------------------------------------


def test_corrupt_frame_byte_raises():
    payload, _ = _hand_container()
    info = parse_streaminfo(payload)
    for off in range(info["frames_at"], len(payload)):
        bad = bytearray(payload)
        bad[off] ^= 0x40
        with pytest.raises(ValueError):
            decode_flac(bytes(bad))


def test_tampered_md5_raises():
    payload, _ = _hand_container()
    bad = bytearray(payload)
    bad[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # ... and verify_md5=False is the documented escape hatch
    assert decode_flac(bytes(bad), verify_md5=False)[2] == [[10, -3, 7, 7]]


def test_truncation_and_bad_magic_raise():
    payload, _ = _hand_container()
    with pytest.raises(ValueError):
        decode_flac(payload[:30])
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"fLaX" + payload[4:])
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # no metadata at all


# --------------------------------------------------------------------------
# Generator + oracle
# --------------------------------------------------------------------------


def test_track_spec_policy_coverage():
    modes, feats = set(), set()
    for i in range(30):
        spec, _ = _track_spec(i, 42)
        if spec["nch"] == 2:
            modes.add(spec["stereo_mode"])
        for k in ("rice2", "force_escape", "sr_in_frame",
                  "bps_from_streaminfo"):
            if spec[k]:
                feats.add(k)
    assert modes == {"independent", "left_side", "right_side", "mid_side"}
    assert feats == {"rice2", "force_escape", "sr_in_frame",
                     "bps_from_streaminfo"}


def test_generate_media_flac_payloads_are_genuine(spark):
    from recon_spark.operators.flac import generate_media_flac

    rows = generate_media_flac(spark, 12).collect()
    assert len(rows) == 12
    for r in rows:
        p = bytes(r["payload"])
        assert p[:4] == b"fLaC"
        spec, chans = _track_spec(r["media_id"], 42)
        sr, bps, out = decode_flac(p)
        assert sr == spec["sr"] and bps == spec["bps"]
        assert out == chans
        assert r["meta"]["codec"] == "flac"
        if spec["nch"] == 2:
            assert first_frame_channel_mode(p) == spec["stereo_mode"]


def test_decode_flac_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_MULTIMODAL_DECODE_FLAC,
        q_multimodal_decode_flac,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(
        spark, ddb, q_multimodal_decode_flac, SQL_MULTIMODAL_DECODE_FLAC,
        SF_ORACLE,
    )


# --------------------------------------------------------------------------
# VORBIS_COMMENT tags (round 5)
# --------------------------------------------------------------------------


def test_vorbis_comment_hand_built_block():
    from recon_spark.operators.flac import parse_flac_tags

    # hand-laid-out: STREAMINFO (not last) + type-4 block with one
    # comment "TITLE=Hi" and vendor "v"
    payload, _ = _hand_container()
    info_block = payload[4:4 + 4 + 34]
    vc = (b"\x01\x00\x00\x00" + b"v"
          + b"\x01\x00\x00\x00"
          + b"\x08\x00\x00\x00" + b"TITLE=Hi")
    tagged = (b"fLaC"
              + bytes([info_block[0] & 0x7F]) + info_block[1:]
              + bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
              + payload[4 + 4 + 34:])
    assert parse_flac_tags(tagged) == {"TITLE": "Hi"}
    assert decode_flac(tagged)[2] == [[10, -3, 7, 7]]


def test_vorbis_comment_round_trip_edges():
    from recon_spark.operators.flac import encode_flac, parse_flac_tags

    spec, chans = _track_spec(5, 42)
    p = encode_flac(spec["sr"], spec["bps"], chans,
                    tags=[("title", "héllo"), ("Artist", "x=y"),
                          ("EMPTY", "")],
                    stereo_mode=spec["stereo_mode"])
    tags = parse_flac_tags(p)
    # keys case-fold to upper; '=' in the value survives; UTF-8 decodes
    assert tags == {"TITLE": "héllo", "ARTIST": "x=y", "EMPTY": ""}
    # the tag block must not disturb decode or the MD5 pin
    assert decode_flac(p)[2] == chans
    # untagged containers report no tags, not an error
    assert parse_flac_tags(encode_flac(8000, 8, [[1, 2, 3]])) == {}


def test_flac_tags_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_AUDIO_FLAC_TAGS, q_audio_flac_tags
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_audio_flac_tags, SQL_AUDIO_FLAC_TAGS,
                  SF_ORACLE)
