"""Dataset/Corpus lifecycle: op registry, lineage counts, rollback —
mirroring the reference's state-machine goldens
(tests/test_operations.py:26-96, tests/test_dataset.py:60-117)."""

import pytest
from pyspark.sql import functions as F

from recon_spark.operations import OPERATIONS, Corpus, Dataset
from recon_spark.operators.corrections import corrections_from_dict

SPAN_DDL = (
    "array<struct<text: string, start: int, end: int, label: string, "
    "token_start: int, token_end: int, kb_id: string, source: string>>"
)


def mk_examples(spark):
    rows = [
        (1, "python is a skill", [("python", 0, 6, "skill")]),
        (2, "ml is a skill and model is a skill", [("ml", 0, 2, "SKILL"), ("model", 18, 23, "skill")]),
        (3, "model is also a product", [("model", 0, 5, "PRODUCT")]),
        (4, "nothing here", []),
    ]
    data = [
        (
            i,
            t,
            [
                {"text": x, "start": s, "end": e, "label": l,
                 "token_start": None, "token_end": None, "kb_id": None, "source": None}
                for x, s, e, l in spans
            ],
        )
        for i, t, spans in rows
    ]
    return spark.createDataFrame(data, schema=f"id long, text string, spans {SPAN_DDL}")


def test_registry_names_preserved():
    for name in [
        "recon.upcase_labels.v1",
        "recon.rename_labels.v1",
        "recon.fix_annotations.v1",
        "recon.strip_annotations.v1",
        "recon.filter_overlaps.v1",
        "recon.add_tokens.v1",
        "recon.split_sentences.v1",
    ]:
        assert name in OPERATIONS


def test_apply_lineage_counts_and_rollback(spark, tmp_path):
    ds = Dataset("skills", mk_examples(spark), str(tmp_path / "ds"))
    before = ds.stats()
    assert before["n_examples"] == 4 and before["n_annotations"] == 4

    # upcase changes exactly the examples with lowercase labels (ids 1, 2);
    # id 3 is already uppercase, id 4 has no spans
    res = ds.apply_("recon.upcase_labels.v1")
    assert res.added == 0 and res.removed == 0
    assert res.changed == 2
    labels = {
        s["label"]
        for r in ds.df.select("spans").collect()
        for s in r["spans"]
    }
    assert labels == {"SKILL", "PRODUCT"}

    # corrections: delete 'ml', retag model PRODUCT->SKILL
    fixes = corrections_from_dict({"ml": None, "model": (["PRODUCT"], "SKILL")})
    res2 = ds.apply_("recon.fix_annotations.v1", fixes)
    assert res2.changed == 2  # id 2 lost a span, id 3 retagged
    after = ds.stats()
    assert after["n_annotations"] == 3

    # rollback restores pre-op stats (reference tests/test_dataset.py:90-117)
    ds.rollback(1)
    assert ds.stats()["n_annotations"] == 4
    ds.rollback(1)
    assert ds.stats() == before
    hashes = [h["commit_hash"] for h in ds.store.history()]
    assert len(set(hashes)) == len(hashes) - 0  # each op produced distinct content


def test_pipe_and_commit_hash_stability(spark, tmp_path):
    ds1 = Dataset("a", mk_examples(spark), str(tmp_path / "a"))
    ds1.pipe_(["recon.upcase_labels.v1", "recon.filter_overlaps.v1"])
    ds2 = Dataset("b", mk_examples(spark), str(tmp_path / "b"))
    ds2.pipe_(["recon.upcase_labels.v1", "recon.filter_overlaps.v1"])
    # deterministic content -> identical commit hashes across runs
    assert ds1.commit_hash == ds2.commit_hash


def test_add_tokens_drops_misaligned(spark, tmp_path):
    df = mk_examples(spark)
    bad = spark.createDataFrame(
        [(9, "abc def", [{"text": "bc", "start": 1, "end": 3, "label": "X",
                          "token_start": None, "token_end": None, "kb_id": None, "source": None}])],
        schema=f"id long, text string, spans {SPAN_DDL}",
    )
    ds = Dataset("tok", df.unionByName(bad), str(tmp_path / "tok"))
    res = ds.apply_("recon.add_tokens.v1")
    assert res.removed == 1  # the misaligned example is dropped
    assert ds.stats()["n_examples"] == 4


def test_corpus_apply_over_splits(spark, tmp_path):
    df = mk_examples(spark)
    corpus = Corpus(
        "c",
        {"train": df.where("id <= 2"), "dev": df.where("id = 3"), "test": df.where("id = 4")},
        str(tmp_path / "corpus"),
    )
    counts = corpus.apply(lambda d: d.count())
    assert counts == {"train": 2, "dev": 1, "test": 1, "all": 4}


def test_search(spark, tmp_path):
    ds = Dataset("s", mk_examples(spark), str(tmp_path / "s"))
    assert ds.search("MODEL").count() == 2
    assert ds.search("MODEL", case_sensitive=True).count() == 0


def test_stats_cli_matches_distributed_similarity():
    """The stats CLI's driver-side JS matrix must reproduce the
    distributed label_distribution_similarity bit-for-bit (value pinned
    from the operator path on sf0.001)."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "recon_spark", "stats",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--master", "local[4]"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert len(d["splits"]) == 20
    assert d["label_distribution_similarity"]["src0/src1"] == 73.358172
    assert all(v["n_examples"] == 25 for v in d["splits"].values())
