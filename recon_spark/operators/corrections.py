"""Bulk correction operators (label/span fixes over nested span arrays).

Reference: /root/reference/recon/corrections.py — rename_labels (:12-25),
fix_annotations (:28-95), corrections_from_dict (:98-139),
strip_annotations (:142-176), split_sentences (:179-233); plus
upcase_labels from /root/reference/recon/validation.py:7-19.

All span edits are pure JVM higher-order functions (transform/filter) —
no Python on the hot path. Correction rule sets are small dimension
tables by construction (human-authored), so they are inlined into the
expression tree (the broadcast-join degenerate case: a literal map
beats a shuffle or even a broadcast hash join for <O(10^4) rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rebuild_span(updates: dict[str, str]) -> str:
    """named_struct(...) SQL preserving span field order with overrides."""
    fields = ["text", "start", "end", "label", "token_start", "token_end", "kb_id", "source"]
    parts = []
    for f in fields:
        parts.append(f"'{f}', {updates.get(f, 's.' + f)}")
    return "named_struct(" + ", ".join(parts) + ")"


def upcase_labels(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Uppercase every span label (recon.upcase_labels.v1)."""
    expr = f"transform({spans_col}, s -> {_rebuild_span({'label': 'upper(s.label)'})})"
    return df.withColumn(spans_col, F.expr(expr))


def rename_labels(
    df: DataFrame, label_map: dict[str, str], spans_col: str = "spans"
) -> DataFrame:
    """label → label rename via mapping (recon.rename_labels.v1);
    unmapped labels pass through."""
    if not label_map:
        return df
    kv = ", ".join(f"'{k}', '{v}'" for k, v in label_map.items())
    upd = {"label": f"coalesce(element_at(map({kv}), s.label), s.label)"}
    expr = f"transform({spans_col}, s -> {_rebuild_span(upd)})"
    return df.withColumn(spans_col, F.expr(expr))


def corrections_from_dict(d: dict[str, object]) -> list[tuple[str, list[str], str | None]]:
    """Shorthand dict → correction rules, mirroring the reference's
    corrections_from_dict: value is a target label, None (delete),
    (from, to) or ([froms], to)."""
    out: list[tuple[str, list[str], str | None]] = []
    for key, val in d.items():
        if val is None or isinstance(val, str):
            out.append((key, ["ANY"], val))
        elif isinstance(val, tuple):
            froms = [val[0]] if isinstance(val[0], str) else list(val[0])
            out.append((key, froms, val[1]))
        else:
            raise ValueError(f"Cannot parse correction value {val!r} for {key!r}")
    return out


def fix_annotations(
    df: DataFrame,
    corrections: list[tuple[str, list[str], str | None]],
    case_sensitive: bool = False,
    spans_col: str = "spans",
) -> DataFrame:
    """Apply correction rules to spans (recon.fix_annotations.v1):
    for a span whose surface matches a rule's annotation and whose label
    is in from_labels (or from_labels contains 'ANY'): retag to to_label,
    or drop the span when to_label is None. Never adds spans."""
    if not corrections:
        return df

    def surf(e: str) -> str:
        return e if case_sensitive else f"lower({e})"

    drop_conds = []
    label_expr = "s.label"
    # build nested CASE right-to-left so first-matching-rule wins like the
    # reference's dict lookup (annotations are unique keys there; keep
    # last-write-wins for duplicate annotations by iterating in order)
    for ann, froms, to in corrections:
        ann_key = ann if case_sensitive else ann.lower()
        from_ok = (
            "true"
            if "ANY" in froms
            else "array_contains(array(" + ", ".join(f"'{f}'" for f in froms) + "), s.label)"
        )
        cond = f"({surf('s.text')} = '{ann_key}' AND {from_ok})"
        if to is None:
            drop_conds.append(cond)
        else:
            label_expr = f"CASE WHEN {cond} THEN '{to}' ELSE {label_expr} END"

    kept = (
        f"filter({spans_col}, s -> NOT (" + " OR ".join(drop_conds) + "))"
        if drop_conds
        else spans_col
    )
    expr = f"transform({kept}, s -> {_rebuild_span({'label': label_expr})})"
    return df.withColumn(spans_col, F.expr(expr))


DEFAULT_STRIP_CHARS = ".!?-: "


def strip_annotations(
    df: DataFrame, strip_chars: str = DEFAULT_STRIP_CHARS, spans_col: str = "spans"
) -> DataFrame:
    """Trim leading/trailing strip-chars from every span surface, moving
    start/end to keep the offset invariant; spans stripping to nothing
    are dropped (recon.strip_annotations.v1; the reference IndexErrors on
    that edge — SURVEY.md §2.2)."""
    cls = "[" + "".join("\\\\" + c if c in r"\^]-" else c for c in strip_chars) + "]"
    lead = f"length(s.text) - length(regexp_replace(s.text, '^{cls}+', ''))"
    trail = f"length(s.text) - length(regexp_replace(s.text, '{cls}+$', ''))"
    upd = {
        "text": f"regexp_replace(regexp_replace(s.text, '^{cls}+', ''), '{cls}+$', '')",
        "start": f"CAST(s.start + ({lead}) AS INT)",
        "end": f"CAST(s.end - ({trail}) AS INT)",
    }
    expr = (
        f"filter(transform({spans_col}, s -> {_rebuild_span(upd)}),"
        " s -> length(s.text) > 0)"
    )
    return df.withColumn(spans_col, F.expr(expr))


def split_sentences_jvm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans_col: str = "spans",
    delimiter: str = ". ",
) -> DataFrame:
    """split_sentences entirely in JVM: literal split → aggregate fold
    attaching cumulative char bases → posexplode → per-sentence span
    filter + offset re-base. Bit-equal to the mapInArrow kernel for
    start-sorted span arrays (ours always are — asserted in
    tests/test_span_core.py); ~10x the Python kernel's throughput at
    500k docs. One-to-many with zero Python and zero shuffle."""
    import re as _re

    quoted = _re.escape(delimiter).replace("\\", "\\\\").replace("'", "\\'")
    dlen = len(delimiter)
    span_ddl = (
        "ARRAY<STRUCT<text: STRING, start: INT, end: INT, label: STRING, "
        "token_start: INT, token_end: INT, kb_id: STRING, source: STRING>>"
    )
    fold = f"""
    aggregate(
      split({text_col}, '{quoted}', -1),
      named_struct('base', 0, 'arr',
        CAST(array() AS ARRAY<STRUCT<sent: STRING, base: INT>>)),
      (acc, s) -> named_struct(
        'base', acc.base + length(s) + {dlen},
        'arr', array_append(acc.arr, named_struct('sent', s, 'base', acc.base))),
      acc -> acc.arr)
    """
    rebase = f"""
    transform(
      filter({spans_col},
             sp -> sp.start >= __s.base AND sp.end <= __s.base + length(__s.sent)),
      sp -> named_struct(
        'text', sp.text,
        'start', CAST(sp.start - __s.base AS INT),
        'end', CAST(sp.end - __s.base AS INT),
        'label', sp.label, 'token_start', sp.token_start,
        'token_end', sp.token_end, 'kb_id', sp.kb_id, 'source', sp.source))
    """
    return (
        df.select(id_col, spans_col, F.expr(fold).alias("__sents"))
        .select(id_col, spans_col, F.posexplode("__sents").alias("sent_id", "__s"))
        .select(
            id_col,
            F.col("sent_id").cast("int").alias("sent_id"),
            F.col("__s.sent").alias(text_col),
            F.expr(rebase).cast(span_ddl).alias(spans_col),
        )
    )


def split_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    spans_col: str = "spans",
    delimiter: str = ". ",
) -> DataFrame:
    """Split each row into per-sentence rows, re-basing span offsets
    relative to the sentence start (recon.split_sentences.v1,
    /root/reference/recon/corrections.py:179-233; spans crossing a
    boundary are dropped like the reference's failed char_span lookups).
    One-to-many: mapInArrow emitting (id, sent_id, text, spans)."""
    import pyarrow as pa

    from recon_spark.core.spans import split_sentences as _split_py

    span_pa = pa.struct(
        [
            ("text", pa.string()),
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("label", pa.string()),
            ("token_start", pa.int32()),
            ("token_end", pa.int32()),
            ("kb_id", pa.string()),
            ("source", pa.string()),
        ]
    )
    out_ddl = (
        f"{id_col} long, sent_id int, {text_col} string, {spans_col} "
        "array<struct<text: string, start: int, end: int, label: string, "
        "token_start: int, token_end: int, kb_id: string, source: string>>"
    )
    fields = ["text", "start", "end", "label", "token_start", "token_end", "kb_id", "source"]

    def _gen(batches):
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            spans_in = batch.column(spans_col).to_pylist()
            o_id, o_sid, o_text, o_spans = [], [], [], []
            for rid, t, spans in zip(ids, texts, spans_in):
                for k, (sent, sp) in enumerate(_split_py(t, spans or [], delimiter)):
                    o_id.append(rid)
                    o_sid.append(k)
                    o_text.append(sent)
                    o_spans.append([{f: s.get(f) for f in fields} for s in sp])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, pa.int64()),
                    pa.array(o_sid, pa.int32()),
                    pa.array(o_text, pa.string()),
                    pa.array(o_spans, pa.list_(span_pa)),
                ],
                [id_col, "sent_id", text_col, spans_col],
            )

    return df.mapInArrow(_gen, out_ddl)


def search(df: DataFrame, query: str, text_col: str = "text", case_sensitive: bool = False) -> DataFrame:
    """Substring search over text (reference Dataset.search,
    recon/dataset.py:291-311) — a pushdown-friendly filter."""
    col = F.col(text_col) if case_sensitive else F.lower(F.col(text_col))
    q = query if case_sensitive else query.lower()
    return df.where(col.contains(q))
