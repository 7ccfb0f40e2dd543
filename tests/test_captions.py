"""SRT caption parsing + video-text alignment (round 5)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from recon_spark.operators.captions import parse_srt, srt_text


def test_srt_hand_written_document(spark):
    """A hand-WRITTEN SRT document (not built by srt_text) parses to
    the literal cues — the parser never sees our builder."""
    doc = (
        "1\n00:00:01,000 --> 00:00:02,500\nHello there\n"
        "\n"
        "2\n01:02:03,004 --> 01:02:04,000\nsecond cue\nwith two lines\n"
        "\n"
        "not a cue at all\n"
        "\n"
        "3\n00:10:00,000 --> 00:10:01,000\n  padded  \n"
    )
    df = spark.createDataFrame([(7, doc)], "doc_id long, srt string")
    rows = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in parse_srt(df).collect()
    )
    assert rows == [
        (1, 1_000, 2_500, "Hello there"),
        (2, 3_723_004, 3_724_000, "second cue with two lines"),
        (3, 600_000, 601_000, "padded"),
    ]


@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2 * 3_600_000),
        st.integers(min_value=1, max_value=5_000),
        st.text(alphabet="abc XYZ-09", min_size=1, max_size=30),
    ),
    min_size=1, max_size=6,
))
@settings(max_examples=40, deadline=None)
def test_srt_round_trip_property(spark, raw):
    cues = [(s, s + d, t.strip() or "x") for s, d, t in raw]
    doc = srt_text(cues)
    df = spark.createDataFrame([(1, doc)], "doc_id long, srt string")
    got = {
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in parse_srt(df).collect()
    }
    # multi-space captions collapse only across newlines; these have none
    exp = {(k + 1, s, e, " ".join(t.split("\n")))
           for k, (s, e, t) in enumerate(cues)}
    assert got == exp


def test_srt_garbage_and_empty_drop(spark):
    df = spark.createDataFrame(
        [(1, "no cues here"), (2, ""), (3, "1\nmissing timing\ntext")],
        "doc_id long, srt string",
    )
    assert parse_srt(df).count() == 0


def test_caption_align_query_matches_oracle(spark, ddb):
    from recon_spark.queries.extra import (
        SQL_VIDEO_CAPTION_ALIGN,
        q_video_caption_align,
    )
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_video_caption_align,
                  SQL_VIDEO_CAPTION_ALIGN, SF_ORACLE)


def test_caption_align_is_broadcast_and_covers_both_shots(spark):
    from recon_spark.queries.extra import q_video_caption_align

    df = q_video_caption_align(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    rows = df.collect()
    shots = {r.shot_idx for r in rows}
    assert shots == {0, 1}
    # every cue's caption survived the parse (never empty)
    assert all(r.caption.startswith("cap-") for r in rows)


def test_vtt_hand_written_document(spark):
    from recon_spark.operators.captions import parse_vtt

    doc = (
        "WEBVTT\n"
        "\n"
        "00:01.000 --> 00:02.500\nHello there\n"
        "\n"
        "01:02:03.004 --> 01:02:04.000\nsecond cue\nwith two lines\n"
        "\n"
        "NOTE this is a comment block, not a cue\n"
        "\n"
        "10:00.000 --> 10:01.000\n  padded  \n"
    )
    df = spark.createDataFrame([(7, doc)], "doc_id long, srt string")
    rows = sorted(
        (r.cue_idx, r.start_ms, r.end_ms, r.caption)
        for r in parse_vtt(df).collect()
    )
    assert rows == [
        (1, 1_000, 2_500, "Hello there"),
        (2, 3_723_004, 3_724_000, "second cue with two lines"),
        (3, 600_000, 601_000, "padded"),
    ]


def test_vtt_and_srt_parse_to_identical_cue_tables(spark):
    from recon_spark.operators.captions import (
        parse_vtt,
        srt_text,
        vtt_text,
    )

    cues = [(0, 80, "a"), (3_783_123, 3_783_203, "b\nc"), (59_999, 60_050, "d")]
    both = spark.createDataFrame(
        [(1, srt_text(cues)), (2, vtt_text(cues))], "doc_id long, srt string")
    srt_rows = {tuple(r)[1:] for r in
                parse_srt(both.where("doc_id = 1")).collect()}
    vtt_rows = {tuple(r)[1:] for r in
                parse_vtt(both.where("doc_id = 2")).collect()}
    assert srt_rows == vtt_rows and len(srt_rows) == 3


def test_caption_parsers_are_python_free(spark):
    """The 100-TB claim: the cue extraction must be pure JVM — no
    Python eval node anywhere in either parser's plan."""
    from recon_spark.operators.captions import parse_vtt

    df = spark.createDataFrame([(1, "x")], "doc_id long, srt string")
    for parsed in (parse_srt(df), parse_vtt(df)):
        plan = parsed._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInArrow" not in plan
        assert "PythonUDF" not in plan
