"""xxh3_64 parity with the reference's pinned commit hashes
(/root/reference/tests/test_dataset.py:18,26): same bits for the empty
dataset, the full dev-split chain, and the distributed UDF column."""

import json

import pytest

from recon_spark.hashing import (
    HAVE_XXH3,
    dataset_hash,
    example_hash,
    example_hash_column,
    xxh3_64,
)

pytestmark = pytest.mark.skipif(not HAVE_XXH3, reason="libxxhash not available")

SKILLS = "/root/reference/examples/data/skills"


def load_examples(path):
    out = []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            text = r["text"]
            spans = []
            for s in r.get("spans") or []:
                sp = dict(s)
                if sp.get("text") is None:  # the span-text validator fill
                    sp["text"] = text[sp["start"] : sp["end"]]
                spans.append(sp)
            out.append((text, spans))
    return out


def test_empty_dataset_pin():
    assert xxh3_64(b"train") == 17832947943417816456


def test_dev_dataset_pin():
    hashes = [example_hash(t, s) for t, s in load_examples(f"{SKILLS}/dev.jsonl")]
    assert dataset_hash("dev", hashes) == 13155558785603486975


def test_train_mutation_pin():
    """Reference: Dataset('train', train[:-1]) then append last example
    -> hash 4129752577878698003 (test_dataset.py:30-40)."""
    hashes = [example_hash(t, s) for t, s in load_examples(f"{SKILLS}/train.jsonl")]
    assert dataset_hash("train", hashes) == 4129752577878698003


def test_udf_matches_driver(spark):
    rows = load_examples(f"{SKILLS}/dev.jsonl")[:40]
    data = [
        (
            t,
            [
                {"text": s["text"], "start": s["start"], "end": s["end"],
                 "label": s["label"], "token_start": s.get("token_start"),
                 "token_end": s.get("token_end"), "kb_id": None, "source": None}
                for s in spans
            ],
        )
        for t, spans in rows
    ]
    df = spark.createDataFrame(
        data,
        "text string, spans array<struct<text: string, start: int, end: int,"
        "label: string, token_start: int, token_end: int, kb_id: string,"
        "source: string>>",
    )
    got = [
        r["h"] % (1 << 64)
        for r in df.withColumn("h", example_hash_column(df)).select("h").collect()
    ]
    want = [example_hash(t, s) for t, s in rows]
    assert got == want


def test_dataset_reference_commit_hash_pin(spark, tmp_path):
    """End-to-end: a Dataset built from the reference's dev fixture
    reproduces the reference's pinned commit hash 13155558785603486975
    (/root/reference/tests/test_dataset.py:26) through the distributed
    hash column + ordered dataset_hash fold."""
    from recon_spark.operations import Dataset

    rows = load_examples(f"{SKILLS}/dev.jsonl")
    data = [
        (
            i,
            t,
            [
                {"text": s["text"], "start": s["start"], "end": s["end"],
                 "label": s["label"], "token_start": s.get("token_start"),
                 "token_end": s.get("token_end"), "kb_id": None, "source": None}
                for s in spans
            ],
        )
        for i, (t, spans) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "idx long, text string, spans array<struct<text: string, start: int,"
        "end: int, label: string, token_start: int, token_end: int,"
        "kb_id: string, source: string>>",
    ).repartition(4)  # parity must not depend on partitioning
    ds = Dataset("dev", df, str(tmp_path / "dev"))
    assert ds.reference_commit_hash(order_col="idx") == 13155558785603486975
