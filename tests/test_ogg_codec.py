"""Ogg container + FLAC-to-Ogg mapping (round 5, RFC 3533 / RFC 9639
appendix).

Pinning strategy:
- the Ogg CRC-32 (poly 0x04C11DB7, init 0, non-reflected, no final
  XOR) is pinned against an INDEPENDENT table-driven implementation
  written in this test, over hypothesis byte strings;
- a page is HAND-ASSEMBLED field by field (capture pattern, flags,
  granule, serial, sequence, lacing) and must parse to the literal
  packet — the parser never sees our page builder;
- packet reassembly edge cases are driven through hand-built pages:
  a packet of exactly k*255 bytes (terminal 0 lacing), packets
  spanning pages (continued flag both honored and enforced), page
  sequence gaps (lost-page detection);
- the FLAC mapping round-trips the SAME digest PCM as the native
  container (lossless through two container layers, MD5 still pinned).
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.flac import _track_spec
from recon_spark.operators.ogg import (
    _build_page,
    _segments_of,
    decode_ogg_flac,
    encode_ogg_flac,
    ogg_crc,
    ogg_flac_first_frame_mode,
    ogg_packets,
    parse_ogg_pages,
)

# --------------------------------------------------------------------------
# CRC pinned against an independent table-driven implementation
# --------------------------------------------------------------------------

_TABLE = []
for _b in range(256):
    _r = _b << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _TABLE.append(_r)


def _crc_table(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_ogg_crc_matches_independent_table(data):
    assert ogg_crc(data) == _crc_table(data)


def test_ogg_crc_differs_from_zlib():
    import zlib

    # same polynomial, but Ogg is non-reflected with init/xorout 0:
    # the two must NOT agree (guards against accidentally using zlib)
    assert ogg_crc(b"123456789") != zlib.crc32(b"123456789")


# --------------------------------------------------------------------------
# Hand-assembled page
# --------------------------------------------------------------------------


def _hand_page(packet: bytes, flags: int = 0x02, granule: int = 7,
               serial: int = 0xABCD, seq: int = 0) -> bytes:
    hdr = (b"OggS" + b"\x00" + bytes([flags])
           + struct.pack("<q", granule) + struct.pack("<I", serial)
           + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
           + bytes([1, len(packet)]))
    page = hdr + packet
    return page[:22] + struct.pack("<I", _crc_table(page)) + page[26:]


def test_hand_assembled_page_parses():
    page = _hand_page(b"hello ogg")
    [p] = list(parse_ogg_pages(page))
    assert p["flags"] == 0x02 and p["granule"] == 7
    assert p["serial"] == 0xABCD and p["segments"] == [b"hello ogg"]
    assert list(ogg_packets(page)) == [(0xABCD, b"hello ogg")]


def test_page_corruption_detected():
    page = bytearray(_hand_page(b"hello ogg"))
    for off in range(4, len(page)):
        bad = bytearray(page)
        bad[off] ^= 0x10
        with pytest.raises(ValueError):
            list(parse_ogg_pages(bytes(bad)))
    with pytest.raises(ValueError, match="capture"):
        list(parse_ogg_pages(b"XggS" + bytes(page[4:])))
    with pytest.raises(ValueError, match="truncated"):
        list(parse_ogg_pages(bytes(page[:-3])))


# --------------------------------------------------------------------------
# Packet reassembly edge cases through hand-built pages
# --------------------------------------------------------------------------


def test_exact_multiple_of_255_needs_terminal_zero_lacing():
    pkt = bytes(range(256)) * 2  # 510 = 2*255
    segs = _segments_of(pkt[:510])
    assert [len(s) for s in segs] == [255, 255, 0]
    page = _build_page(segs, 0x02, 0, 1, 0)
    assert list(ogg_packets(page)) == [(1, pkt[:510])]


def test_packet_spanning_pages_and_continued_flag():
    pkt = bytes(300)
    p0 = _build_page([pkt[:255]], 0x02, -1, 9, 0)         # ends mid-packet
    p1 = _build_page([pkt[255:]], 0x01, 300, 9, 1)        # continued
    assert list(ogg_packets(p0 + p1)) == [(9, pkt)]
    # continued flag missing on the second page -> hard error
    p1_bad = _build_page([pkt[255:]], 0x00, 300, 9, 1)
    with pytest.raises(ValueError, match="continued"):
        list(ogg_packets(p0 + p1_bad))
    # continued flag set but nothing pending -> hard error
    with pytest.raises(ValueError, match="continued"):
        list(ogg_packets(_build_page([b"x"], 0x01, 0, 9, 0)))
    # stream ending mid-packet -> hard error
    with pytest.raises(ValueError, match="mid-packet"):
        list(ogg_packets(p0))


def test_page_sequence_gap_detected():
    a = _build_page([b"a"], 0x02, 0, 5, 0)
    c = _build_page([b"c"], 0x00, 0, 5, 2)  # seq 1 missing
    with pytest.raises(ValueError, match="sequence gap"):
        list(ogg_packets(a + c))


# --------------------------------------------------------------------------
# FLAC mapping round trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("cap", [2, 3, 16])
def test_ogg_flac_round_trip_policy_rotation(cap):
    for i in range(0, 24):
        spec, chans = _track_spec(i, 42)
        p = encode_ogg_flac(
            spec["sr"], spec["bps"], chans, block_size=16,
            max_segs_per_page=cap, stereo_mode=spec["stereo_mode"],
            type_sel=spec["type_sel"],
            partition_order=spec["partition_order"], rice2=spec["rice2"],
            force_escape=spec["force_escape"],
        )
        sr, bps, out = decode_ogg_flac(p)
        assert (sr, bps) == (spec["sr"], spec["bps"])
        assert out == chans
        if spec["nch"] == 2:
            assert ogg_flac_first_frame_mode(p) == spec["stereo_mode"]


def test_big_frames_force_continuation_and_granules():
    import hashlib

    d = hashlib.sha256(b"big").digest()
    pcm = [d[(2 * j) % 32] * 256 + d[(2 * j + 13) % 32] - 32768
           for j in range(1024)]
    p = encode_ogg_flac(44100, 16, [pcm], block_size=256, type_sel=0,
                        max_segs_per_page=2)
    pages = list(parse_ogg_pages(p))
    assert sum(1 for pg in pages if pg["flags"] & 0x01) >= 2
    assert pages[0]["flags"] & 0x02 and pages[-1]["flags"] & 0x04
    # granule invariant: -1 on pages where no frame completes,
    # non-decreasing cumulative sample counts elsewhere, total at EOS
    grans = [pg["granule"] for pg in pages[1:]]
    done = [g for g in grans if g != -1]
    assert done == sorted(done) and done[-1] == 1024
    assert decode_ogg_flac(p)[2] == [pcm]


def test_bos_eos_flags_and_mapping_header():
    spec, chans = _track_spec(1, 42)
    p = encode_ogg_flac(spec["sr"], spec["bps"], chans, block_size=16,
                        stereo_mode=spec["stereo_mode"])
    pages = list(parse_ogg_pages(p))
    assert pages[0]["flags"] & 0x02 and pages[-1]["flags"] & 0x04
    serial, first = next(iter(ogg_packets(p)))
    assert first[:7] == b"\x7fFLAC\x01\x00"
    assert first[9:13] == b"fLaC"
    # a non-FLAC first packet must be rejected by the mapping layer
    bad = _build_page(_segments_of(b"\x01vorbis..."), 0x02, 0, 3, 0)
    with pytest.raises(ValueError, match="mapping"):
        decode_ogg_flac(bad)


def test_probe_handles_ogg_flac():
    from recon_spark.operators.probe import probe_media

    spec, chans = _track_spec(8, 42)
    p = encode_ogg_flac(spec["sr"], spec["bps"], chans, block_size=16,
                        stereo_mode=spec["stereo_mode"])
    r = probe_media(p)
    assert (r["format"], r["variant"]) == ("ogg", "flac")
    assert r["sample_rate"] == spec["sr"] and r["n_frames"] == spec["ns"]
    assert r["channels"] == spec["nch"] and r["bps"] == spec["bps"]


def test_generate_media_ogg_payloads_are_genuine(spark):
    from recon_spark.operators.ogg import generate_media_ogg

    rows = generate_media_ogg(spark, 10).collect()
    assert len(rows) == 10
    for r in rows:
        p = bytes(r["payload"])
        assert p[:4] == b"OggS"
        spec, chans = _track_spec(r["media_id"], 42)
        sr, bps, out = decode_ogg_flac(p)
        assert sr == spec["sr"] and bps == spec["bps"] and out == chans
        assert r["meta"]["codec"] == "ogg-flac"


def test_decode_ogg_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_MULTIMODAL_DECODE_FLAC,
        q_multimodal_decode_ogg,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(
        spark, ddb, q_multimodal_decode_ogg, SQL_MULTIMODAL_DECODE_FLAC,
        SF_ORACLE,
    )
