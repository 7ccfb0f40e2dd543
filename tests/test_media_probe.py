"""Header-only media probe (round 5) — the pre-decode triage pass.

Pinning strategy:
- the MP3 frame-length math is pinned to the PUBLISHED example
  (128 kbps / 44.1 kHz / no padding -> 417 bytes) and to hand-built
  headers, independent of our generator;
- probe fields must agree with the FULL decoders on the same payloads
  (probe reads headers, decode reads everything — both must tell the
  same story);
- GIF frame counting and TIFF page counting are structural walks that
  must never touch entropy data: proven by corrupting the LZW/strip
  bytes and asserting the probe still answers while the decoder fails;
- corrupt/truncated/unknown bytes: probe_media raises, probe_media_safe
  returns a status row.
"""

import struct

import pytest

from recon_spark.operators.probe import (
    _build_probe_payload,
    _probe_spec,
    encode_mp3_frames,
    probe_media,
    probe_media_safe,
)

# --------------------------------------------------------------------------
# MP3: published frame math + hand-built headers
# --------------------------------------------------------------------------


def test_mp3_published_frame_length():
    # the canonical worked example: MPEG-1 Layer III, 128 kbps, 44.1 kHz,
    # no padding -> floor(144 * 128000 / 44100) = 417 bytes
    p = encode_mp3_frames(1, 128, 44100, b"t")
    assert len(p) == 417
    assert p[:2] == b"\xff\xfb"  # sync + MPEG1 + Layer III + no-CRC
    r = probe_media(p)
    assert r["format"] == "mp3" and r["n_frames"] == 1
    assert r["duration_ms"] == 1152 * 1000 // 44100


def test_mp3_padding_bit_adds_one_byte():
    # frames alternate padding 0/1: total = 417 + 418
    p = encode_mp3_frames(2, 128, 44100, b"t")
    assert len(p) == 417 + 418
    assert probe_media(p)["n_frames"] == 2


def test_mp3_id3v2_skip():
    plain = encode_mp3_frames(3, 192, 48000, b"x")
    tagged = encode_mp3_frames(3, 192, 48000, b"x", id3=True)
    assert tagged[:3] == b"ID3" and len(tagged) > len(plain)
    assert probe_media(tagged) == probe_media(plain)


def test_mp3_mono_mode_and_rates():
    r = probe_media(encode_mp3_frames(4, 320, 32000, b"m", mode_mono=True))
    assert r["channels"] == 1 and r["sample_rate"] == 32000
    assert r["duration_ms"] == 4 * 1152 * 1000 // 32000


def test_mp3_rejects_bad_streams():
    good = encode_mp3_frames(2, 128, 44100, b"t")
    with pytest.raises(ValueError, match="sync|truncated|EOF"):
        probe_media(good[:-5])  # walk does not land on EOF
    bad = bytearray(good)
    bad[1] &= 0xF7  # clear a version bit -> MPEG2
    with pytest.raises(ValueError, match="MPEG-1"):
        probe_media(bytes(bad))
    bad = bytearray(good)
    bad[2] |= 0xF0  # bitrate index 15 (invalid)
    with pytest.raises(ValueError, match="bitrate"):
        probe_media(bytes(bad))


# --------------------------------------------------------------------------
# Probe must agree with the full decoders on the same payloads
# --------------------------------------------------------------------------


def test_probe_agrees_with_decoders():
    from recon_spark.operators import multimodal as M
    from recon_spark.operators.flac import decode_flac

    for i in range(0, 64):
        p = _build_probe_payload(i, 42)
        s = _probe_spec(i, 42)
        r = probe_media(p)
        assert r["format"] == s["cls"]
        if s["cls"] == "png":
            w, h, ctype, px = M.decode_png(p)
            assert (r["width"], r["height"]) == (w, h)
        elif s["cls"] == "gif":
            frames = M.decode_gif_frames(p)[2]
            assert r["n_frames"] == len(frames)
        elif s["cls"] == "tiff":
            pages = M.decode_tiff_pages(p)
            assert r["n_frames"] == len(pages)
        elif s["cls"] == "jpeg":
            w, h, comps, px = M.decode_jpeg(p)
            assert (r["width"], r["height"]) == (w, h)
        elif s["cls"] == "wav":
            sr, samples = M.decode_wav(p)
            assert (r["sample_rate"], r["n_frames"]) == (sr, len(samples))
        elif s["cls"] == "flac":
            sr, bps, chans = decode_flac(p)
            assert (r["sample_rate"], r["bps"], r["n_frames"]) == (
                sr, bps, len(chans[0]))


def test_probe_never_touches_entropy_data():
    """Corrupt the compressed pixel bytes of a multi-frame GIF and a
    multi-page TIFF: the decoder must fail (or change output), the
    probe must return the identical answer — structural walk only."""
    from recon_spark.operators import multimodal as M

    gif = bytearray(_build_probe_payload(10, 42))   # id 10 -> gif, 2 frames
    before = probe_media(bytes(gif))
    assert before["format"] == "gif" and before["n_frames"] >= 2
    # flip bits inside the LAST image's data sub-block payload (just
    # before the trailer, skipping the sub-block length byte itself)
    assert gif[-1] == 0x3B
    gif[-4] ^= 0x55
    assert probe_media(bytes(gif)) == before
    with pytest.raises(Exception):
        M.decode_gif_frames(bytes(gif))  # LZW stream is now corrupt

    tiff = bytearray(_build_probe_payload(11, 42))  # id 11 -> tiff
    before = probe_media(bytes(tiff))
    assert before["format"] == "tiff"
    # strip data lives between the 8-byte header and the first IFD
    tiff[9] ^= 0xFF
    assert probe_media(bytes(tiff)) == before


# --------------------------------------------------------------------------
# Corruption + triage wrapper
# --------------------------------------------------------------------------


def test_probe_raises_on_truncation_and_unknown():
    gif = _build_probe_payload(2, 42)
    with pytest.raises(ValueError):
        probe_media(gif[:-2])  # trailer gone
    with pytest.raises(ValueError, match="unrecognized"):
        probe_media(b"\x00\x01\x02\x03not media")
    png = bytearray(_build_probe_payload(1, 42))
    png[12:16] = b"XXXX"  # IHDR tag destroyed
    with pytest.raises(ValueError, match="IHDR"):
        probe_media(bytes(png))


def test_probe_media_safe_statuses():
    ok = probe_media_safe(_build_probe_payload(0, 42))
    assert ok["status"] == "ok" and ok["format"] == "bmp"
    unk = probe_media_safe(b"\x00\x01\x02\x03not media")
    assert unk["status"] == "unknown" and unk["format"] == "unknown"
    bad = probe_media_safe(_build_probe_payload(2, 42)[:-2])
    assert bad["status"].startswith("corrupt:")


def test_jpeg_probe_stops_before_scan():
    # SOS before SOF is malformed: the walk must not wander into
    # entropy-coded bytes looking for a SOF
    p = b"\xff\xd8\xff\xda\x00\x04\x01\x00" + b"\xff" * 64
    with pytest.raises(ValueError, match="SOF"):
        probe_media(p)


def test_bmp_and_ppm_probe_fields():
    from recon_spark.operators import multimodal as M

    bmp = M.encode_bmp(5, 3, [10] * 45)
    r = probe_media(bmp)
    assert (r["format"], r["width"], r["height"], r["channels"]) == (
        "bmp", 5, 3, 3)
    ppm = M.encode_ppm(4, 2, [10] * 24)
    r = probe_media(ppm)
    assert (r["format"], r["width"], r["height"]) == ("ppm", 4, 2)


# --------------------------------------------------------------------------
# Query vs oracle
# --------------------------------------------------------------------------


def test_probe_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_MULTIMODAL_PROBE, q_multimodal_probe
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_multimodal_probe, SQL_MULTIMODAL_PROBE, SF_ORACLE)


def test_warc_media_triage_matches_oracle(spark, ddb):
    """Probe-then-decode budget chain over a mixed WARC shard: probe
    fields for all five media classes AND the selectively-decoded PCM
    sums must both match the relational recomputation (a wrongly-
    budgeted decode — too many or too few rows decoded — hash-fails
    on the decoded/abs_sum columns)."""
    from recon_spark.queries.extra import SQL_WARC_MEDIA_TRIAGE, q_warc_media_triage
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_warc_media_triage, SQL_WARC_MEDIA_TRIAGE,
                  SF_ORACLE)


def test_triage_selectivity_is_real(spark):
    """The budget predicate must actually split the shard: some rows
    decoded, most not, and no non-lossless format ever decoded."""
    from recon_spark.queries.extra import q_warc_media_triage

    rows = q_warc_media_triage(spark, "/root/testdata/sf0.001").collect()
    decoded = [r for r in rows if r.decoded == 1]
    assert 0 < len(decoded) < len(rows) / 2
    assert all(r.format in ("flac", "ogg") for r in decoded)
    assert all(r.abs_sum == 0 for r in rows if r.decoded == 0)
    assert all(r.abs_sum > 0 for r in decoded)
    # mp3 rows carry probe-derived duration without any decode
    mp3 = [r for r in rows if r.format == "mp3"]
    assert mp3 and all(r.duration_ms > 0 and r.decoded == 0 for r in mp3)


# --------------------------------------------------------------------------
# ID3v2.3 tag codec
# --------------------------------------------------------------------------


def test_id3_round_trip_both_encodings():
    from recon_spark.operators.probe import encode_id3v2, parse_id3v2

    frames = [("TIT2", "hello"), ("TPE1", "müller"), ("TALB", "albüm")]
    tag = encode_id3v2(frames, utf16_ids=("TALB",))
    assert tag[:5] == b"ID3\x03\x00"
    got = parse_id3v2(tag)
    assert got == dict(frames)
    # the UTF-16 frame really is UTF-16 (BOM present after enc byte 1)
    at = tag.find(b"TALB") + 10
    assert tag[at] == 1 and tag[at + 1:at + 3] in (b"\xff\xfe", b"\xfe\xff")


def test_id3_hand_built_tag_parses():
    from recon_spark.operators.probe import parse_id3v2

    # hand-laid-out v2.3 tag: one latin-1 TIT2 "Hi" + 4 padding bytes
    frame = b"TIT2" + struct.pack(">I", 3) + b"\x00\x00" + b"\x00Hi"
    body = frame + b"\x00\x00\x00\x00"
    tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, len(body)]) + body
    assert parse_id3v2(tag) == {"TIT2": "Hi"}


def test_id3_skips_non_text_and_rejects_corruption():
    from recon_spark.operators.probe import parse_id3v2

    apic = b"APIC" + struct.pack(">I", 4) + b"\x00\x00" + b"\x89PNG"
    tit2 = b"TIT2" + struct.pack(">I", 2) + b"\x00\x00" + b"\x00A"
    body = apic + tit2
    tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, len(body)]) + body
    assert parse_id3v2(tag) == {"TIT2": "A"}  # APIC skipped, not an error
    assert parse_id3v2(b"no tag here") == {}
    with pytest.raises(ValueError, match="version"):
        parse_id3v2(b"ID3\x04\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_id3v2(tag[:-1])


def test_id3_coexists_with_frame_walk():
    """A real tag followed by real frames: tags parse AND the probe's
    frame walk still lands on EOF with the right count."""
    from recon_spark.operators.probe import (
        encode_mp3_frames,
        parse_id3v2,
        probe_media,
    )

    p = encode_mp3_frames(5, 192, 48000, b"x",
                          id3_frames=[("TIT2", "t"), ("TPE1", "a")])
    assert parse_id3v2(p) == {"TIT2": "t", "TPE1": "a"}
    r = probe_media(p)
    assert r["n_frames"] == 5 and r["sample_rate"] == 48000


def test_id3_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_AUDIO_ID3_TAGS, q_audio_id3_tags
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_audio_id3_tags, SQL_AUDIO_ID3_TAGS, SF_ORACLE)


def test_warc_media_inventory_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_WARC_MEDIA_INVENTORY,
        q_warc_media_inventory,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_warc_media_inventory,
                  SQL_WARC_MEDIA_INVENTORY, SF_ORACLE)


def test_inventory_classifies_every_record(spark):
    """All six classes present (five media + 'unknown' for html), html
    never counted ok, and the probe never drops a record."""
    from recon_spark.queries.extra import _WARC_AUDIO_N, q_warc_media_inventory

    rows = {r.format: r for r in
            q_warc_media_inventory(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"flac", "ogg", "mp3", "wav", "png", "unknown"}
    assert rows["unknown"].n_records == _WARC_AUDIO_N
    assert rows["unknown"].n_ok == 0
    assert sum(r.n_records for r in rows.values()) == 2 * _WARC_AUDIO_N
    for f in ("flac", "ogg", "mp3", "wav", "png"):
        assert rows[f].n_ok == rows[f].n_records == _WARC_AUDIO_N // 5
