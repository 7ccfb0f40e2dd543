"""N-Triples / N-Quads interchange (recon_spark/rdf.py).

The escape/encode properties are checked against an INDEPENDENT pure-
Python reference (single-pass character maps / regex decoders, not the
replace-chain the Spark side uses), hypothesis-driven; the Spark
columns are then pinned to that reference over a nasty-string batch in
one job. Parsing is pinned on handcrafted external-form fixtures
covering every grammar branch the module claims (lang tags, typed
literals, IRI objects, graphs, comments, blank lines, malformed-line
surfacing, foreign ECHARs, the UCHAR-verbatim policy).
"""

import gzip
import os
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from recon_spark.rdf import (
    ENT,
    PRED,
    escape_literal,
    iri_decode,
    iri_encode,
    local_name,
    parse_rdf_lines,
    read_ntriples,
    serialize_triples,
    term_iri,
    term_literal,
    unescape_literal,
    write_ntriples,
)

# --------------------------------------------------------------------------
# independent references: single-pass character maps, NOT replace chains
# --------------------------------------------------------------------------

_ENC_MAP = {
    "%": "%25", " ": "%20", '"': "%22", "<": "%3C", ">": "%3E",
    "\\": "%5C", "^": "%5E", "`": "%60", "{": "%7B", "|": "%7C",
    "}": "%7D", "\n": "%0A", "\r": "%0D", "\t": "%09",
}
_DEC_RE = re.compile("%(" + "|".join(v[1:] for v in _ENC_MAP.values()) + ")")
_ESC_MAP = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_UNESC_MAP = {
    "\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t",
    "\\b": "\b", "\\f": "\f", "\\'": "'",
}


def py_iri_encode(s: str) -> str:
    return "".join(_ENC_MAP.get(ch, ch) for ch in s)


def py_iri_decode(s: str) -> str:
    return _DEC_RE.sub(lambda m: bytes.fromhex(m.group(1)).decode("latin-1"), s)


def py_escape(s: str) -> str:
    return "".join(_ESC_MAP.get(ch, ch) for ch in s)


def py_unescape(s: str) -> str:
    # left-to-right single scan: exactly the grammar's tokenization
    return re.sub(
        r"\\.", lambda m: _UNESC_MAP.get(m.group(0), m.group(0)), s
    )


# NUL is the unescape chain's sentinel (documented in rdf.py): exclude it
TEXT = st.text(
    alphabet=st.characters(blacklist_characters="\x00"), max_size=60
)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_py_reference_roundtrips(s):
    assert py_iri_decode(py_iri_encode(s)) == s
    assert py_unescape(py_escape(s)) == s
    # encoded IRIs contain none of the forbidden characters
    assert not set(py_iri_encode(s)) & (set(_ENC_MAP) - {"%"})
    # escaped literals are valid STRING_LITERAL_QUOTE bodies: every
    # quote/backslash is escape-consumed, no raw newline/CR survives
    esc = py_escape(s)
    assert re.fullmatch(r'(?:[^"\\\n\r]|\\.)*', esc, re.S), repr(esc)


_NASTY = [
    "",
    "plain",
    'jo "jojo" o\'reilly',
    "back\\slash \\n fake",
    "\\\\n double-escape bait",
    "tab\there\nnewline\rcr",
    "% %25 %%25%",
    "<angle> {brace} |pipe| ^caret^ `tick`",
    "café … ügly 中文 🎉",
    "   leading and trailing   ",
    "\\",
    '"',
    '\\"',
    "a\\tb",  # literal backslash-t chars, must NOT decode to a tab
    "%3C not an angle",  # pre-encoded-looking input must round-trip raw
]


def test_spark_matches_py_reference(spark):
    df = spark.createDataFrame([(s,) for s in _NASTY], "s string")
    got = df.select(
        iri_encode("s").alias("enc"),
        iri_decode(iri_encode("s")).alias("enc_rt"),
        escape_literal("s").alias("esc"),
        unescape_literal(escape_literal("s")).alias("esc_rt"),
    ).collect()
    for s, r in zip(_NASTY, got):
        assert r.enc == py_iri_encode(s), repr(s)
        assert r.enc_rt == s, repr(s)
        assert r.esc == py_escape(s), repr(s)
        assert r.esc_rt == s, repr(s)


def test_foreign_echars_and_uchar_policy(spark):
    df = spark.createDataFrame(
        [(r"bell\b feed\f quote\' done",), (r"uchar A stays",)],
        "s string",
    )
    got = [r.u for r in df.select(unescape_literal("s").alias("u")).collect()]
    assert got[0] == "bell\b feed\f quote' done"
    # numeric UCHAR escapes are preserved verbatim (documented policy)
    assert got[1] == r"uchar A stays"


# --------------------------------------------------------------------------
# parsing: every grammar branch, external form
# --------------------------------------------------------------------------

_EXTERNAL = [
    '<http://a/s> <http://a/p> "hola"@es .',
    '<http://a/s> <http://a/p> "5"^^<http://www.w3.org/2001/XMLSchema#long> .',
    "<http://a/s> <http://a/p> <http://a/o> .",
    '<http://a/s> <http://a/p> "o" <http://graph/g> .',
    "<http://a/s> <http://a/p> <http://a/o> <http://graph/g> .",
    '<http://a/s> <http://a/p> "" .',  # empty literal, not an IRI
    "# a comment",
    "   ",
    "",
    "garbage that is not a triple",
    '  <http://a/s> <http://a/p> "ws tolerant"  .  ',
]


def test_parse_external_forms(spark):
    df = spark.createDataFrame([(s,) for s in _EXTERNAL], "value string")
    rows = parse_rdf_lines(df).collect()
    # comments and blanks are dropped: 11 lines -> 8 rows
    assert len(rows) == 8
    by_obj = {
        (r.obj_lit, r.obj_iri): r for r in rows if r.bad_line is None
    }
    assert by_obj[("hola", None)].lang == "es"
    five = by_obj[("5", None)]
    assert five.datatype == "http://www.w3.org/2001/XMLSchema#long"
    assert five.lang is None
    iri_rows = [r for r in rows if r.obj_iri == "http://a/o"]
    assert {r.graph for r in iri_rows} == {None, "http://graph/g"}
    assert by_obj[("o", None)].graph == "http://graph/g"
    empty = by_obj[("", None)]
    assert empty.obj_iri is None and empty.subj == "http://a/s"
    assert by_obj[("ws tolerant", None)].pred == "http://a/p"
    bad = [r for r in rows if r.bad_line is not None]
    assert len(bad) == 1 and bad[0].bad_line == "garbage that is not a triple"
    assert bad[0].subj is None


def test_parse_carries_extra_columns(spark):
    df = spark.createDataFrame(
        [(7, '<http://a/s> <http://a/p> "x" .')], "doc_id long, value string"
    )
    r = parse_rdf_lines(df).collect()[0]
    assert r.doc_id == 7 and r.obj_lit == "x"


# --------------------------------------------------------------------------
# serialization + file round trip
# --------------------------------------------------------------------------

_TRIPLES = [
    ("acme corp", "founded_by", 'jo "jojo" o\'reilly\n\\x', "https://ex.org/d/1"),
    ("plain", "rel", "obj", "https://ex.org/d/2"),
    ("tab\there", "a%b", "<angle> & {brace}|pipe^`", "https://ex.org/d/3"),
    ("", "empty", "", "https://ex.org/d/4"),
]


def _roundtrip(spark, tmp_path, compression=None):
    df = spark.createDataFrame(
        _TRIPLES, "subj string, pred string, obj string, url string"
    )
    ser = serialize_triples(df, graph="url")
    out = str(tmp_path / ("nq_gz" if compression else "nq"))
    write_ntriples(ser, out, compression=compression)
    back = read_ntriples(spark, out).select(
        local_name("subj", ENT).alias("subj"),
        local_name("pred", PRED).alias("pred"),
        F.col("obj_lit").alias("obj"),
        F.col("graph").alias("url"),
    )
    got = sorted((r.subj, r.pred, r.obj, r.url) for r in back.collect())
    assert got == sorted(_TRIPLES)
    return out


def test_file_roundtrip(spark, tmp_path):
    out = _roundtrip(spark, tmp_path)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert parts, "text sink wrote no shards"


def test_file_roundtrip_gzip(spark, tmp_path):
    out = _roundtrip(spark, tmp_path, compression="gzip")
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert parts and all(f.endswith(".gz") for f in parts)
    # some shards are empty partitions; find the first real line
    lines = []
    for p in sorted(parts):
        with gzip.open(os.path.join(out, p), "rt", encoding="utf-8") as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    assert len(lines) == len(_TRIPLES)
    assert all(ln.startswith("<") and ln.endswith(" .") for ln in lines)


def test_typed_and_lang_literals_roundtrip(spark):
    df = spark.createDataFrame([(3, "name x",)], "n long, s string")
    line_typed = df.select(
        F.concat(
            term_iri("s", ENT), F.lit(" <p:c> "),
            term_literal("n", datatype="http://www.w3.org/2001/XMLSchema#long"),
            F.lit(" ."),
        ).alias("value")
    )
    r = parse_rdf_lines(line_typed).collect()[0]
    assert r.obj_lit == "3"
    assert r.datatype == "http://www.w3.org/2001/XMLSchema#long"
    line_lang = df.select(
        F.concat(
            term_iri("s", ENT), F.lit(" <p:l> "),
            term_literal("s", lang="en"), F.lit(" ."),
        ).alias("value")
    )
    r = parse_rdf_lines(line_lang).collect()[0]
    assert r.obj_lit == "name x" and r.lang == "en"
    with pytest.raises(ValueError):
        term_literal("s", lang="en", datatype="d")


# --------------------------------------------------------------------------
# plan audit: the whole chain is JVM-side
# --------------------------------------------------------------------------


def test_serialize_and_parse_have_no_python_stage(spark):
    df = spark.createDataFrame(_TRIPLES, "subj string, pred string, obj string, url string")
    ser = serialize_triples(df, graph="url")
    parsed = parse_rdf_lines(ser.withColumn("value", F.col("line")))
    for frame in (ser, parsed):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
