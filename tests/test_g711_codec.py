"""G.711 µ-law / A-law codec (round 5).

The ITU-T G.711 companding curves are closed-form segment arithmetic
(the canonical public-domain Sun g711.c math), so compressed telephony
WAVs decode wheel-free. Pinning is independent of our encoder:

- the published curve extremes (µ-law ±32124, A-law ±32256, the two
  µ-law zero codes, the A-law ±8 minimum) are asserted as constants;
- the stdlib ``wave`` module must REJECT format codes 6/7, proving the
  manual RIFF walker is load-bearing, not decorative;
- the DuckDB oracle's closed-form expansion must equal the Python
  tables for all 256 codes (the relational twin of the decoder).
"""

import io
import struct
import wave

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.multimodal import (
    _ALAW_TABLE,
    _ULAW_TABLE,
    _linear2alaw,
    _linear2ulaw,
    _riff_chunks,
    decode_wav,
    encode_wav,
    encode_wav_g711,
)


# --------------------------------------------------------------------------
# Curve pinning: published G.711 constants
# --------------------------------------------------------------------------


def test_ulaw_published_extremes():
    assert _ULAW_TABLE[0x00] == -32124  # most negative
    assert _ULAW_TABLE[0x80] == 32124  # most positive
    assert _ULAW_TABLE[0xFF] == 0  # +0 code
    assert _ULAW_TABLE[0x7F] == 0  # -0 code (same linear value)


def test_alaw_published_extremes():
    assert _ALAW_TABLE[0x2A] == -32256
    assert _ALAW_TABLE[0xAA] == 32256
    # A-law has no zero: the innermost codes are +/-8
    assert _ALAW_TABLE[0x55] == -8
    assert _ALAW_TABLE[0xD5] == 8
    assert 0 not in _ALAW_TABLE


def test_code_round_trip_all_256():
    """encode(decode(b)) == b for every code — except µ-law 0x7F, the
    -0 code, which canonically re-encodes as the +0 code 0xFF."""
    assert [b for b in range(256) if _linear2ulaw(_ULAW_TABLE[b]) != b] == [0x7F]
    assert _linear2ulaw(_ULAW_TABLE[0x7F]) == 0xFF
    assert [b for b in range(256) if _linear2alaw(_ALAW_TABLE[b]) != b] == []


@settings(max_examples=200, deadline=None)
@given(x=st.integers(-32768, 32767))
def test_quantization_idempotent(x):
    """decode(encode(x)) lands on the companding lattice: re-encoding
    is a fixed point (covers the clip + segment-overflow boundary)."""
    bu = _linear2ulaw(x)
    assert _linear2ulaw(_ULAW_TABLE[bu]) == bu
    ba = _linear2alaw(x)
    assert _linear2alaw(_ALAW_TABLE[ba]) == ba


@settings(max_examples=100, deadline=None)
@given(x=st.integers(-32768, 32767))
def test_quantization_error_bounded(x):
    """Companding error is bounded by half the top-segment step (1024,
    so <=512 + encoder truncation; µ-law also clips at ±32124)."""
    xu = max(-32124, min(32124, x))
    assert abs(_ULAW_TABLE[_linear2ulaw(x)] - xu) <= 516
    assert abs(_ALAW_TABLE[_linear2alaw(x)] - x) <= 516


# --------------------------------------------------------------------------
# Container: RIFF walker + wave-module independence
# --------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=400),
    law=st.sampled_from(["ulaw", "alaw"]),
    sr=st.sampled_from([8000, 16000]),
)
def test_wav_g711_round_trip(data, law, sr):
    table = _ULAW_TABLE if law == "ulaw" else _ALAW_TABLE
    p = encode_wav_g711(sr, data, law)
    assert decode_wav(p) == (sr, [table[b] for b in data])


def test_wave_module_rejects_g711():
    """The stdlib wave module only accepts WAVE_FORMAT_PCM — if this
    ever starts passing, the manual path stops being load-bearing and
    this test should be revisited."""
    for law in ("ulaw", "alaw"):
        p = encode_wav_g711(8000, b"\x00\x01\x02", law)
        with pytest.raises(wave.Error):
            wave.open(io.BytesIO(p), "rb")


def test_pcm_path_unchanged():
    p = encode_wav(16000, [0, 100, -100, 32767, -32768])
    assert decode_wav(p) == (16000, [0, 100, -100, 32767, -32768])


def test_riff_walker_odd_chunk_padding():
    """Odd-sized data chunk gets a pad byte per the RIFF spec; the
    walker must skip it and still find later chunks."""
    p = encode_wav_g711(8000, b"\x07\x08\x09", "ulaw")  # odd data size
    ids = [cid for cid, _ in _riff_chunks(p)]
    assert ids == [b"fmt ", b"fact", b"data"]
    (data,) = [c for cid, c in _riff_chunks(p) if cid == b"data"]
    assert data == b"\x07\x08\x09"


def test_riff_walker_corruption():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"RIFX" + b"\x00" * 40)
    p = encode_wav_g711(8000, bytes(range(50)), "alaw")
    # cut INSIDE the fact chunk's declared extent: its 8-byte header at
    # offset 38 is intact at 48 bytes, but the declared payload (ends at
    # 50) is not
    with pytest.raises(ValueError, match="truncated RIFF chunk"):
        list(_riff_chunks(p[:48]))
    # stereo G.711 keeps an honest gate
    stereo = bytearray(p)
    at = stereo.index(b"fmt ") + 8
    struct.pack_into("<H", stereo, at + 2, 2)
    with pytest.raises(NotImplementedError, match="mono"):
        decode_wav(bytes(stereo))


# --------------------------------------------------------------------------
# Oracle parity: the closed-form SQL expansion IS the decode table
# --------------------------------------------------------------------------


def test_sql_closed_form_matches_tables(ddb):
    from recon_spark.queries.extra import _SQL_ALAW, _SQL_ULAW

    rows = ddb.sql(
        f"SELECT b, {_SQL_ULAW.format(b='b')} AS u, {_SQL_ALAW.format(b='b')} AS a "
        "FROM (SELECT unnest(generate_series(0, 255)) AS b) ORDER BY b"
    ).fetchall()
    assert all(r[1] == _ULAW_TABLE[r[0]] for r in rows)
    assert all(r[2] == _ALAW_TABLE[r[0]] for r in rows)


def test_generate_media_g711_payloads_are_genuine(spark):
    from recon_spark.operators.multimodal import generate_media_g711

    rows = generate_media_g711(spark, 8).collect()
    assert len(rows) == 8
    for r in rows:
        p = bytes(r["payload"])
        assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
        sr, samples = decode_wav(p)
        assert sr == 8000
        assert len(samples) == 40 + r["media_id"] % 32
        assert r["meta"]["codec"] == ("ulaw" if r["media_id"] % 2 == 0 else "alaw")


def test_decode_g711_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_MULTIMODAL_DECODE_G711,
        q_multimodal_decode_g711,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(
        spark, ddb, q_multimodal_decode_g711, SQL_MULTIMODAL_DECODE_G711, SF_ORACLE
    )
