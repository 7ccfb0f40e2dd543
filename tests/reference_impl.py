"""Independent single-process reference implementation (the parity oracle).

Implements the same PUBLIC SPEC as the distributed pipeline — html->text
extraction, maximal-munch mention scan, SVO adjacency triples, top-1 alias
canonicalization — with deliberately different machinery (a character
state machine instead of regex tag stripping; a token-index scan instead
of a regex alternation). The BASELINE contract is checked against this:
byte-identical text per url, triple-set P/R >= 0.95.
"""

from __future__ import annotations

from recon_spark.gazetteer import (
    ALIASES,
    GAZ_AMBIG,
    GAZ_FIXED,
    PREDICATES,
)

_BIGRAMS = {s for s in list(GAZ_FIXED) + list(GAZ_AMBIG) if " " in s}
_UNIGRAMS = {s for s in list(GAZ_FIXED) + list(GAZ_AMBIG) if " " not in s}
_PREDS = set(PREDICATES)

# top-1 alias candidate per surface: highest score, entity_id tiebreak
_BEST_ALIAS: dict[str, str] = {}
for alias, eid, _name, score in sorted(ALIASES, key=lambda r: (r[0], -r[3], r[1])):
    _BEST_ALIAS.setdefault(alias, eid)


def ref_text(html: bytes) -> str:
    """Character state machine: drop <head>..</head>, tags -> space,
    unescape &amp; &lt; &gt;, collapse whitespace."""
    s = html.decode("utf-8")
    # drop head section
    hs = s.find("<head>")
    he = s.find("</head>")
    if hs != -1 and he != -1:
        s = s[:hs] + s[he + len("</head>") :]
    out_chars: list[str] = []
    in_tag = False
    for ch in s:
        if in_tag:
            if ch == ">":
                in_tag = False
                out_chars.append(" ")
        elif ch == "<":
            in_tag = True
        else:
            out_chars.append(ch)
    text = "".join(out_chars)
    text = text.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    return " ".join(text.split())


def ref_mentions(page_id: int, text: str) -> list[tuple[str, str, int, int]]:
    """Maximal-munch over the token list: (surface, label, start, end)."""
    words = text.split(" ")
    starts: list[int] = []
    pos = 0
    for w in words:
        starts.append(pos)
        pos += len(w) + 1
    par = page_id % 2
    out = []
    i = 0
    while i < len(words):
        # word-boundary semantics: a surface may be followed by trailing
        # sentence periods inside the same whitespace token ("slow." still
        # contains the mention "slow"), but never preceded/split by them.
        if i + 1 < len(words):
            w2core = words[i + 1].rstrip(".")
            big = words[i] + " " + w2core  # first word must be exact (no
            # boundary can cross its trailing dot), second may carry dots
            if big in _BIGRAMS:
                lab = GAZ_FIXED.get(big) or GAZ_AMBIG[big][par]
                out.append((big, lab, starts[i], starts[i + 1] + len(w2core)))
                i += 2
                continue
        core = words[i].rstrip(".")
        if core in _UNIGRAMS:
            lab = GAZ_FIXED.get(core) or GAZ_AMBIG[core][par]
            out.append((core, lab, starts[i], starts[i] + len(core)))
        i += 1
    return out


def ref_triples(page_id: int, text: str) -> set[tuple[str, str, str, int]]:
    """Token-adjacency SVO -> canonicalized (subj, pred, obj, subj_start)."""
    words = text.split(" ")
    starts: list[int] = []
    pos = 0
    for w in words:
        starts.append(pos)
        pos += len(w) + 1
    out = set()
    for i in range(len(words) - 2):
        s, p, o = words[i], words[i + 1], words[i + 2]
        if s in _UNIGRAMS and p in _PREDS and o in _UNIGRAMS:
            out.add(
                (
                    _BEST_ALIAS.get(s, s),
                    p,
                    _BEST_ALIAS.get(o, o),
                    starts[i],
                )
            )
    return out
