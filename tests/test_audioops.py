"""Audio curation metrics + gate (round 5) — integer-exact by design."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.audioops import audio_gate, audio_metrics


def test_metrics_golden():
    # bps=8: fs=128, clip at |s|>=127, silent below 2
    m = audio_metrics([0, 127, -128, 1, -1, 50], bps=8)
    assert m["n_samples"] == 6
    assert m["peak"] == 128
    assert m["sum_sq"] == 0 + 127**2 + 128**2 + 1 + 1 + 2500
    assert m["n_clip"] == 2          # 127 and -128
    assert m["n_silent"] == 3        # 0, 1, -1
    # signs: + + - + - +  (0 counts as non-negative) -> 4 transitions
    assert m["zcross"] == 4


def test_gate_branches():
    # clean: no clipping, little silence
    clean = audio_metrics([40, -40] * 30, bps=8)
    assert audio_gate(clean)
    # clipped: 2 rail samples in 60 -> 2*50 >= 60 fails
    clipped = audio_metrics([40, -40] * 29 + [127, -128], bps=8)
    assert not audio_gate(clipped)
    # silent: over half the samples under the threshold
    silent = audio_metrics([0] * 31 + [40] * 29, bps=8)
    assert not audio_gate(silent)


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=120))
@settings(max_examples=100, deadline=None)
def test_metrics_match_naive_reference(samples):
    m = audio_metrics(samples, bps=16)
    assert m["peak"] == max(abs(s) for s in samples)
    assert m["sum_sq"] == sum(s * s for s in samples)
    assert m["n_clip"] == sum(1 for s in samples if abs(s) >= 32767)
    assert m["n_silent"] == sum(1 for s in samples if abs(s) < 512)
    assert m["zcross"] == sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0))


def test_wasted_bit_tracks_fail_silence_gate():
    """The digest PCM's wasted-bit tracks are low-amplitude by
    construction (|s| <= 512 at 16-bit) — the silence rule must
    catch them, proving the gate bites on realistic fixtures."""
    from recon_spark.operators.flac import _track_spec

    failed = checked = 0
    for i in range(0, 60):
        spec, chans = _track_spec(i, 42)
        if spec["bps"] != 16 or i % 6 != 2:
            continue
        checked += 1
        if not audio_gate(audio_metrics(chans[0], 16)):
            failed += 1
    assert checked > 0 and failed == checked


def test_audio_gate_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_AUDIO_QUALITY_GATE, q_audio_quality_gate
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_audio_quality_gate, SQL_AUDIO_QUALITY_GATE,
                  SF_ORACLE)


def test_fingerprint_golden_and_bounds():
    from recon_spark.operators.audioops import _FP_FRAMES, audio_fingerprint

    # 34 samples -> frames of exactly 2; energies strictly increasing
    # -> all 16 bits set
    s = []
    for k in range(_FP_FRAMES):
        s += [k + 1, k + 1]
    assert audio_fingerprint(s) == (1 << 16) - 1
    # strictly decreasing -> no bits
    assert audio_fingerprint(s[::-1]) == 0
    with pytest.raises(ValueError, match="needs"):
        audio_fingerprint([1] * 16)


@given(st.lists(st.integers(min_value=-16000, max_value=16000),
                min_size=34, max_size=120),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=100, deadline=None)
def test_fingerprint_matches_naive_and_is_scale_invariant(samples, c):
    from recon_spark.operators.audioops import audio_fingerprint

    n = len(samples)
    energies = [
        sum(v * v for v in samples[k * n // 17:(k + 1) * n // 17])
        for k in range(17)
    ]
    fp = sum(1 << k for k in range(16) if energies[k + 1] > energies[k])
    assert audio_fingerprint(samples) == fp
    assert audio_fingerprint([c * v for v in samples]) == fp


def test_fingerprint_dedup_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_AUDIO_FINGERPRINT_DEDUP,
        q_audio_fingerprint_dedup,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_audio_fingerprint_dedup,
                  SQL_AUDIO_FINGERPRINT_DEDUP, SF_ORACLE)


def test_fingerprint_dedup_finds_every_injected_pair(spark):
    """Every amplitude-doubled re-encode must land in its base track's
    cluster (recall = 1.0 on the injected class), and the join-back
    must be a broadcast, never a sort-merge."""
    from recon_spark.queries.extra import q_audio_fingerprint_dedup

    df = q_audio_fingerprint_dedup(spark, "/root/testdata/sf0.001")
    rows = {r.media_id: r for r in df.collect()}
    for i in range(1, 200, 4):
        assert rows[i].fingerprint == rows[i - 1].fingerprint, i
        assert rows[i].is_dup == 1 and rows[i - 1].is_dup == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_audio_windows_trim_rule():
    from recon_spark.operators.audioops import audio_windows

    # leading silence trimmed, INTERIOR silence kept, trailing trimmed,
    # short final window handled
    ws = audio_windows([0] * 8 + [1000] * 8 + [0] * 8 + [2000] * 4 + [0] * 9,
                       bps=16, win=8)
    assert [w["kept"] for w in ws] == [False, True, True, True, False]
    assert [w["silent"] for w in ws] == [True, False, True, False, True]
    assert ws[-1]["n_samples"] == 5
    # an all-silent track keeps nothing
    assert all(not w["kept"] for w in audio_windows([0] * 20, 16))


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=100))
@settings(max_examples=80, deadline=None)
def test_audio_windows_partition_and_flags(samples):
    from recon_spark.operators.audioops import audio_windows

    ws = audio_windows(samples, bps=16, win=8)
    # windows exactly partition the track
    assert sum(w["n_samples"] for w in ws) == len(samples)
    assert [w["win_idx"] for w in ws] == list(range(len(ws)))
    for w in ws:
        part = samples[w["win_idx"] * 8:w["win_idx"] * 8 + 8]
        assert w["sum_sq"] == sum(s * s for s in part)
        assert w["silent"] == (w["sum_sq"] < len(part) * 512 * 512)
    kept = [w["win_idx"] for w in ws if w["kept"]]
    non_silent = [w["win_idx"] for w in ws if not w["silent"]]
    if non_silent:
        assert kept == list(range(min(non_silent), max(non_silent) + 1))
    else:
        assert kept == []


def test_audio_chunks_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import SQL_AUDIO_CHUNKS, q_audio_chunks
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_audio_chunks, SQL_AUDIO_CHUNKS, SF_ORACLE)
