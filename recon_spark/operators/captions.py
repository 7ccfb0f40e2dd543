"""SRT caption parsing + video-text alignment — the caption side of a
multimodal training pair.

Video training data is (clip, text) pairs; the text rides in subtitle
files (SRT is the crawl-dominant format). Two pieces:

- ``parse_srt``: cue extraction done ENTIRELY JVM-side — split on
  blank lines, per-cue regexp for the index and the
  ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing line, arithmetic on the
  captured fields for epoch-ms, and a dotall regexp to strip the first
  two lines so multi-line captions survive (joined with a single
  space). Zero Python on the hot path: a 100 TB subtitle sweep is a
  whole-stage-codegen scan. Malformed cues (no timing line) drop, not
  crash.
- ``q_video_caption_align`` (queries/extra.py): cues joined to the
  scene-cut shots of their video by the midpoint rule (a cue belongs
  to the shot containing its temporal midpoint) — the alignment that
  turns (video, srt) into per-shot training text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TIME_RE = (
    r"(\d{2}):(\d{2}):(\d{2}),(\d{3})\s*-->\s*"
    r"(\d{2}):(\d{2}):(\d{2}),(\d{3})"
)


def _ms(cue: Column, group0: int) -> Column:
    h = F.regexp_extract(cue, _TIME_RE, group0 + 1).cast("long")
    m = F.regexp_extract(cue, _TIME_RE, group0 + 2).cast("long")
    s = F.regexp_extract(cue, _TIME_RE, group0 + 3).cast("long")
    ms = F.regexp_extract(cue, _TIME_RE, group0 + 4).cast("long")
    return h * 3_600_000 + m * 60_000 + s * 1_000 + ms


def srt_text(cues: list[tuple[int, int, str]]) -> str:
    """Build a spec-shaped SRT document from (start_ms, end_ms, caption)
    tuples — the generator-side twin of parse_srt (captions may contain
    embedded newlines; indices are 1-based per the format)."""

    def _fmt(t: int) -> str:
        return (f"{t // 3_600_000:02d}:{t // 60_000 % 60:02d}:"
                f"{t // 1_000 % 60:02d},{t % 1_000:03d}")

    blocks = []
    for k, (start, end, caption) in enumerate(cues):
        blocks.append(f"{k + 1}\n{_fmt(start)} --> {_fmt(end)}\n{caption}")
    return "\n\n".join(blocks) + "\n"


def parse_srt(df: DataFrame, col: str = "srt", key_col: str = "doc_id"
              ) -> DataFrame:
    """(key, srt-text) -> one row per cue: (key, cue_idx, start_ms,
    end_ms, caption). All JVM expressions (see module docstring);
    multi-line captions are space-joined; cues without a valid timing
    line are dropped."""
    cues = F.split(F.col(col), r"\r?\n\r?\n")
    ex = df.select(F.col(key_col), F.explode(cues).alias("cue"))
    timing = F.regexp_extract("cue", _TIME_RE, 0)
    caption = F.trim(
        F.regexp_replace(
            # strip everything through the timing line, keep the rest
            F.regexp_extract("cue", r"(?s)-->[^\n]*\n(.*)$", 1),
            r"\s*\r?\n\s*", " ",
        )
    )
    return (
        ex.where(timing != "")
        .select(
            key_col,
            F.regexp_extract("cue", r"(?s)^\s*(\d+)\s*\n", 1)
            .cast("int").alias("cue_idx"),
            _ms(F.col("cue"), 0).alias("start_ms"),
            _ms(F.col("cue"), 4).alias("end_ms"),
            caption.alias("caption"),
        )
    )


_VTT_TIME_RE = (
    r"(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})"
)


def _vtt_ms(cue: Column, group0: int) -> Column:
    h = F.coalesce(
        F.nullif(F.regexp_extract(cue, _VTT_TIME_RE, group0 + 1), F.lit("")),
        F.lit("0"),
    ).cast("long")
    m = F.regexp_extract(cue, _VTT_TIME_RE, group0 + 2).cast("long")
    s = F.regexp_extract(cue, _VTT_TIME_RE, group0 + 3).cast("long")
    ms = F.regexp_extract(cue, _VTT_TIME_RE, group0 + 4).cast("long")
    return h * 3_600_000 + m * 60_000 + s * 1_000 + ms


def vtt_text(cues: list[tuple[int, int, str]]) -> str:
    """WebVTT twin of srt_text: 'WEBVTT' header, '.' millisecond
    separator, OPTIONAL hours (omitted when zero — the spec's short
    form, which the parser must handle), no cue numbers."""

    def _fmt(t: int) -> str:
        hh = t // 3_600_000
        rest = (f"{t // 60_000 % 60:02d}:{t // 1_000 % 60:02d}."
                f"{t % 1_000:03d}")
        return f"{hh:02d}:{rest}" if hh else rest

    blocks = ["WEBVTT"]
    for start, end, caption in cues:
        blocks.append(f"{_fmt(start)} --> {_fmt(end)}\n{caption}")
    return "\n\n".join(blocks) + "\n"


def parse_vtt(df: DataFrame, col: str = "srt", key_col: str = "doc_id"
              ) -> DataFrame:
    """WebVTT -> the SAME cue table parse_srt emits: (key, cue_idx,
    start_ms, end_ms, caption). Differences handled: the WEBVTT header
    block (dropped by the timing filter), '.' millisecond separator,
    optional hour component, NO cue numbers (cue_idx is the 1-based
    position among valid cues of the document, matching SRT numbering
    for well-formed files). JVM-only, like parse_srt."""
    from pyspark.sql import Window

    cues = F.split(F.col(col), r"\r?\n\r?\n")
    ex = df.select(F.col(key_col), F.posexplode(cues).alias("pos", "cue"))
    timing = F.regexp_extract("cue", _VTT_TIME_RE, 0)
    caption = F.trim(
        F.regexp_replace(
            F.regexp_extract("cue", r"(?s)-->[^\n]*\n(.*)$", 1),
            r"\s*\r?\n\s*", " ",
        )
    )
    w = Window.partitionBy(key_col).orderBy("pos")
    return (
        ex.where(timing != "")
        .select(
            key_col,
            F.col("pos"),
            _vtt_ms(F.col("cue"), 0).alias("start_ms"),
            _vtt_ms(F.col("cue"), 4).alias("end_ms"),
            caption.alias("caption"),
        )
        .withColumn("cue_idx", F.row_number().over(w).cast("int"))
        .select(key_col, "cue_idx", "start_ms", "end_ms", "caption")
    )
