"""N-Triples / N-Quads RDF interchange for the materialized KG.

Web Data Commons distributes its Common-Crawl-extracted knowledge graph
as N-Quads (one quad per line, the 4th term naming the source page), so
an engine that claims the crawl->KG pipeline needs to emit and ingest
that format. This module implements the W3C N-Triples / N-Quads
grammars (https://www.w3.org/TR/n-triples/, /TR/n-quads/) as pure JVM
column expressions — `concat` plus bounded `replace` chains for
escaping, one anchored regex for parsing — so serialization and parsing
both stay inside whole-stage codegen with no Python on the hot path.
The sink is Spark's own distributed text writer (one `.nt`/`.nq` shard
per partition, optionally gzipped) and the source is `spark.read.text`,
both of which scale out natively: at 10^12 triples the write is a
map-only stage and the read splits per file (or per block for
uncompressed shards).

Reference analog: recon's Dataset.to_disk/from_disk JSONL round-trip
contract (recon/loaders.py:133-210) — the same "serialize, reload,
byte-identical" guarantee, re-expressed in the KG-native interchange
format instead of recon's example JSONL.

Scope notes (documented, not silent):
- Literal escaping emits the spec's canonical ECHAR set (\\ \" \n \r \t)
  and the parser additionally accepts \b \f \' — everything the grammar
  allows except numeric UCHAR escapes (\\uXXXX); virtually all emitters
  (including WDC) write raw UTF-8, which round-trips here untouched. A
  line using UCHAR parses, but the escape is preserved verbatim in the
  literal rather than decoded.
- IRI percent-encoding covers the characters the N-Triples IRIREF
  production forbids (space, angle brackets, quotes, braces, pipe,
  caret, backtick, backslash, ASCII controls) plus '%' itself, so
  `iri_encode`/`iri_decode` are exact inverses on arbitrary strings.
  Pre-encoded IRIs (e.g. real URLs that already contain %XX) should be
  passed with encode=False to avoid double-encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# escaping — bounded replace chains (JVM StringReplace, codegen-friendly)
# ---------------------------------------------------------------------------

# order matters: '%' must be encoded first (it introduces the escape
# character) and decoded last.
_IRI_ENC: tuple[tuple[str, str], ...] = (
    ("%", "%25"),
    (" ", "%20"),
    ('"', "%22"),
    ("<", "%3C"),
    (">", "%3E"),
    ("\\", "%5C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("{", "%7B"),
    ("|", "%7C"),
    ("}", "%7D"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
)

# literal ECHARs the serializer emits; '\\' first so later replacements
# never double-escape the backslashes they introduce.
_LIT_ENC: tuple[tuple[str, str], ...] = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
)
# extra ECHARs the PARSER accepts (spec allows them; we never emit them)
_LIT_DEC_EXTRA: tuple[tuple[str, str], ...] = (
    ("\\b", "\b"),
    ("\\f", "\f"),
    ("\\'", "'"),
)
# sentinel for the unescape chain: NUL cannot appear in a valid
# N-Triples literal (it would have been escaped), so it is a safe
# stand-in for "a backslash that is already consumed".
_SENTINEL = "\x00"


def iri_encode(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for raw, enc in _IRI_ENC:
        c = F.replace(c, F.lit(raw), F.lit(enc))
    return c


def iri_decode(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for raw, enc in reversed(_IRI_ENC):
        c = F.replace(c, F.lit(enc), F.lit(raw))
    return c


def escape_literal(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for raw, esc in _LIT_ENC:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def unescape_literal(col: Column | str) -> Column:
    """Inverse of escape_literal, plus the \\b \\f \\' forms other
    emitters produce. The sentinel pass makes the chain exact: '\\\\n'
    (escaped backslash, then 'n') must NOT decode to a newline, so all
    double-backslashes are parked on NUL first and restored last."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(c, F.lit("\\\\"), F.lit(_SENTINEL))
    for esc, raw in (("\\n", "\n"), ("\\r", "\r"), ("\\t", "\t"), ('\\"', '"')):
        c = F.replace(c, F.lit(esc), F.lit(raw))
    for esc, raw in _LIT_DEC_EXTRA:
        c = F.replace(c, F.lit(esc), F.lit(raw))
    return F.replace(c, F.lit(_SENTINEL), F.lit("\\"))


# ---------------------------------------------------------------------------
# term construction
# ---------------------------------------------------------------------------


def term_iri(col: Column | str, base: str = "", encode: bool = True) -> Column:
    """`<{base}{pct-encoded value}>`. base is emitted verbatim (it is a
    trusted constant, not data)."""
    c = F.col(col) if isinstance(col, str) else col
    body = iri_encode(c) if encode else c
    return F.concat(F.lit("<" + base), body, F.lit(">"))


def term_literal(
    col: Column | str,
    lang: str | None = None,
    datatype: str | None = None,
) -> Column:
    """`"escaped"` with an optional @lang or ^^<datatype> suffix (the
    grammar allows at most one of the two)."""
    if lang is not None and datatype is not None:
        raise ValueError("a literal takes @lang OR ^^<datatype>, not both")
    c = F.col(col) if isinstance(col, str) else col
    out = F.concat(F.lit('"'), escape_literal(c.cast("string")), F.lit('"'))
    if lang is not None:
        out = F.concat(out, F.lit("@" + lang))
    elif datatype is not None:
        out = F.concat(out, F.lit("^^<" + datatype + ">"))
    return out


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------

KG_BASE = "https://kg.example.org/"
ENT = KG_BASE + "e/"
PRED = KG_BASE + "p/"
XSD_LONG = "http://www.w3.org/2001/XMLSchema#long"


def serialize_triples(
    df: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    graph: str | None = None,
    obj_as_literal: bool = True,
    ent_base: str = ENT,
    pred_base: str = PRED,
    encode_graph: bool = True,
) -> DataFrame:
    """Add a `line` column holding each row's N-Triples (or, with
    `graph`, N-Quads) serialization. Subjects and predicates become
    IRIs under the KG namespace; the object is a plain literal by
    default (our KG stores surface forms / entity ids as strings) or an
    entity IRI with obj_as_literal=False. Map-only — no shuffle; the
    whole expression is one codegen'd projection."""
    parts = [
        term_iri(subj, ent_base),
        F.lit(" "),
        term_iri(pred, pred_base),
        F.lit(" "),
        term_literal(obj) if obj_as_literal else term_iri(obj, ent_base),
    ]
    if graph is not None:
        parts += [F.lit(" "), term_iri(graph, "", encode=encode_graph)]
    parts.append(F.lit(" ."))
    return df.withColumn("line", F.concat(*parts))


def write_ntriples(
    df: DataFrame,
    path: str,
    line: str = "line",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Distributed N-Triples/N-Quads sink: Spark's text writer, one
    shard per partition (gzip per shard with compression='gzip' — the
    layout WDC itself distributes). Unlike the WARC sink this needs no
    custom commit protocol: the text writer goes through Hadoop's
    FileOutputCommitter, so task retries and speculation are safe."""
    w = df.select(F.col(line).alias("value")).write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.text(path)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

# One anchored regex decides the whole line (Java regex; Spark
# regexp_extract pulls single groups out of it):
#   1 subj IRI body   2 pred IRI body
#   3 object IRI body (alternative A)
#   4 literal body    5 @lang    6 ^^datatype IRI body (alternative B)
#   7 graph IRI body (N-Quads only)
# The literal body `(?:[^"\\]|\\.)*` is exact: a raw '"' cannot occur
# inside a literal (it must be escaped), so the match can never run
# past the closing quote.
_LINE_RE = (
    r'^\s*<([^>]*)> <([^>]*)> '
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9\-]+)|\^\^<([^>]*)>)?)'
    r'(?: <([^>]*)>)?\s*\.\s*$'
)


def parse_rdf_lines(lines: DataFrame, value: str = "value") -> DataFrame:
    """Parse N-Triples / N-Quads lines (one DataFrame row per line)
    into typed columns:

      subj, pred        — IRI bodies (undecoded; see iri_decode)
      obj_iri           — IRI body, null for literal objects
      obj_lit           — unescaped literal value, null for IRI objects
      lang, datatype    — literal qualifiers (null when absent)
      graph             — 4th-term IRI body (null for triples)

    Comments and blank lines are dropped; any other non-matching line
    surfaces as a row with null subj and the raw text in `bad_line` so
    corrupt shards are visible rather than silently skipped. Columns of
    `lines` other than `value` pass through unchanged (carry a doc id or
    input_file_name through the parse)."""
    v = F.col(value)
    parsed = (
        lines.where(~v.rlike(r"^\s*(#|$)"))
        .withColumn("__ok", v.rlike(_LINE_RE))
        # which object alternative matched: after the two IRI terms the
        # object's first char is '<' iff it is an IRI.
        .withColumn("__obj_is_iri", v.rlike(r'^\s*<[^>]*> <[^>]*> <'))
    )

    def grp(i: int) -> Column:
        return F.regexp_extract(v, _LINE_RE, i)

    def nullable(c: Column, participate: Column) -> Column:
        return F.when(F.col("__ok") & participate, c)

    t = F.lit(True)
    carried = [c for c in lines.columns if c != value]
    return parsed.select(
        *carried,
        nullable(grp(1), t).alias("subj"),
        nullable(grp(2), t).alias("pred"),
        nullable(grp(3), F.col("__obj_is_iri")).alias("obj_iri"),
        nullable(unescape_literal(grp(4)), ~F.col("__obj_is_iri")).alias("obj_lit"),
        nullable(grp(5), grp(5) != "").alias("lang"),
        nullable(grp(6), grp(6) != "").alias("datatype"),
        nullable(grp(7), grp(7) != "").alias("graph"),
        F.when(~F.col("__ok"), v).alias("bad_line"),
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Distributed N-Triples/N-Quads source: spark.read.text (splits
    per file; per HDFS block for uncompressed shards) -> the codegen'd
    line parser. See parse_rdf_lines for the output schema."""
    return parse_rdf_lines(spark.read.text(path))


def local_name(col: Column | str, base: str) -> Column:
    """Map a parsed IRI body back to the KG-local string it encodes:
    strip the trusted namespace prefix, percent-decode the rest.
    Exact inverse of term_iri(col, base) for any input string."""
    c = F.col(col) if isinstance(col, str) else col
    return iri_decode(F.substring(c, len(base) + 1, 2_000_000_000))
