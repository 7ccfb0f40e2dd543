"""Content hashing with bit-exact reference parity (xxh3_64).

The reference pins xxh3_64 intdigests in its tests
(/root/reference/tests/test_dataset.py:18,26,40) via the ``xxhash``
wheel; this sandbox lacks the wheel but ships the C library
(libxxhash.so.0), so we bind XXH3_64bits with ctypes — same algorithm,
same bits. Field ordering mirrors /root/reference/recon/hashing.py:
- _hash(tpl): sequential update over utf-8(str) / utf-8(str(int))
  == one-shot hash of the concatenation (:120-143)
- span_hash: (start, end, label, text, token_start or 0, token_end or 0)
- example_hash: [text] + per-span [start, end, label, text]
- dataset_hash: (name, *example_hashes)

Parity hashes are for identity/commit comparison with the reference;
internal bucketing stays on Spark's builtin xxhash64 (different
algorithm, irrelevant — SURVEY.md §1.2).

Availability: ``HAVE_XXH3`` gates everything; without the library the
engine falls back to Spark-internal hashing only (parity tests skip).
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Iterable, Iterator, Tuple

import pandas as pd

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    for name in ("libxxhash.so.0", "libxxhash.so", ctypes.util.find_library("xxhash")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.XXH3_64bits.restype = ctypes.c_uint64
            lib.XXH3_64bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
            _lib = lib
            return lib
        except OSError:
            continue
    return None


HAVE_XXH3 = _load() is not None


def xxh3_64(data: bytes) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("libxxhash not available; check HAVE_XXH3 first")
    return int(lib.XXH3_64bits(data, len(data)))


def _encode_items(items: Iterable) -> bytes:
    parts = []
    for item in items:
        if isinstance(item, str):
            parts.append(item.encode("utf-8"))
        elif isinstance(item, (int,)):
            parts.append(str(item).encode("utf-8"))
        else:
            parts.append(bytes(item))
    return b"".join(parts)


def hash_tuple(items: Iterable) -> int:
    """The reference's _hash over a tuple of str/int items."""
    return xxh3_64(_encode_items(items))


def span_hash(span: dict) -> int:
    return hash_tuple(
        (
            span["start"],
            span["end"],
            span["label"],
            span["text"],
            span.get("token_start") or 0,
            span.get("token_end") or 0,
        )
    )


def example_hash(text: str, spans: list[dict]) -> int:
    items: list = [text]
    for s in spans or []:
        items += [s["start"], s["end"], s["label"], s["text"]]
    return hash_tuple(items)


def dataset_hash(name: str, example_hashes: Iterable[int]) -> int:
    return hash_tuple((name, *example_hashes))


def example_hash_column(df, text_col: str = "text", spans_col: str = "spans"):
    """Reference-parity example hash as an Arrow-batched column
    (ARRAY<STRUCT> spans in, BIGINT out; libxxhash loaded once per
    worker process). Signed view of the uint64 so it fits LongType."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _h(batches: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for texts, spans_col_b in batches:
            out = []
            for t, spans in zip(texts, spans_col_b):
                h = example_hash(
                    t,
                    [
                        {
                            "start": s["start"],
                            "end": s["end"],
                            "label": s["label"],
                            "text": s["text"],
                        }
                        for s in (spans if spans is not None else [])
                    ],
                )
                out.append(h - (1 << 64) if h >= 1 << 63 else h)
            yield pd.Series(out, dtype="int64")

    return _h(F.col(text_col), F.col(spans_col))
