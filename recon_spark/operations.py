"""The operation registry + Dataset/Corpus wrappers (pipeline machinery).

Reference: the ``@operation`` registry (recon/operations.py:26-125),
``Dataset.apply_/pipe_/rollback`` (recon/dataset.py:150-289) and
``Corpus`` (recon/corpus.py:13-52). Registry names are preserved
verbatim for parity; each op is a DataFrame -> DataFrame transform.
Lineage (added/removed/changed per op) comes from key+hash anti-join
diffs in the SnapshotStore — never from UDF side effects
(SURVEY.md §7.3.4).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recon_spark.operators import corrections as C
from recon_spark.operators import validation as V
from recon_spark.storage import OpResult, SnapshotStore

OPERATIONS: dict[str, Callable[..., DataFrame]] = {
    # names preserved verbatim from the reference catalogue
    "recon.upcase_labels.v1": lambda df, **kw: C.upcase_labels(df, **kw),
    "recon.rename_labels.v1": lambda df, label_map, **kw: C.rename_labels(df, label_map, **kw),
    "recon.fix_annotations.v1": lambda df, corrections, **kw: C.fix_annotations(df, corrections, **kw),
    "recon.strip_annotations.v1": lambda df, **kw: C.strip_annotations(df, **kw),
    "recon.filter_overlaps.v1": lambda df, **kw: V.filter_overlaps(df, **kw),
    "recon.add_tokens.v1": lambda df, **kw: V.add_tokens(df, **kw),
    "recon.split_sentences.v1": lambda df, **kw: C.split_sentences(df, **kw),
}


def register(name: str):
    """Decorator to add a custom op to the catalogue (the @operation
    analog)."""

    def deco(fn: Callable[..., DataFrame]):
        OPERATIONS[name] = fn
        return fn

    return deco


class Dataset:
    """A named, versioned example table: DataFrame + SnapshotStore.

    Content identity: ``example_hash`` = the reference's xxh3_64 example
    hash (recon/hashing.py:42-59, bit-exact via recon_spark.hashing —
    signed 64-bit view so it fits LongType), recomputed after every op.
    When libxxhash is unavailable the engine falls back to Spark's
    builtin xxhash64 (internal-only identity; parity tests skip).
    """

    def __init__(self, name: str, df: DataFrame, store_dir: str):
        self.name = name
        self.spark = df.sparkSession
        self._df = self._with_hash(df)
        self.store = SnapshotStore(
            self.spark, store_dir, key_col="example_key", hash_col="example_hash"
        )
        if self.store.current_snapshot_id() is None:
            self.store.write_snapshot(self._df, op_name="examples_added_external")
        else:
            self._df = self.store.read()

    @staticmethod
    def _with_hash(df: DataFrame) -> DataFrame:
        from recon_spark.hashing import HAVE_XXH3, example_hash_column

        out = df
        if "example_key" not in df.columns:
            out = out.withColumn("example_key", F.xxhash64("text"))
        if HAVE_XXH3 and "spans" in df.columns:
            return out.withColumn("example_hash", example_hash_column(out))
        return out.withColumn(
            "example_hash", F.xxhash64("text", F.to_json(F.col("spans")))
        )

    @property
    def df(self) -> DataFrame:
        return self._df

    def apply(self, fn: Callable[[DataFrame], DataFrame]) -> DataFrame:
        """Read-only application (Dataset.apply, recon/dataset.py:150-164)."""
        return fn(self._df)

    def apply_(self, op_name: str, *args, **kwargs) -> OpResult:
        """Run a registered op in place, snapshot the result, log lineage
        (Dataset.apply_, recon/dataset.py:166-207)."""
        op = OPERATIONS.get(op_name)
        if op is None:
            raise KeyError(f"unregistered operation: {op_name}")
        out = self._with_hash(op(self._df, *args, **kwargs).drop("example_hash"))
        res = self.store.write_snapshot(
            out, op_name=op_name, args=repr({"args": args, **kwargs})
        )
        self._df = self.store.read()
        return res

    def pipe_(self, op_names: list[str]) -> list[OpResult]:
        """Sequence of ops (Dataset.pipe_, recon/dataset.py:209-238)."""
        return [self.apply_(name) for name in op_names]

    def rollback(self, n: int = 1) -> None:
        """Undo the last n ops (Dataset.rollback, recon/dataset.py:240-289
        — Iceberg-style snapshot pointer move instead of ledger replay)."""
        self.store.rollback(n)
        self._df = self.store.read()

    def search(self, query: str, case_sensitive: bool = False) -> DataFrame:
        return C.search(self._df, query, case_sensitive=case_sensitive)

    def stats(self) -> dict:
        from recon_spark.operators.stats import ner_stats

        row = ner_stats(self._df).collect()[0]
        return {k: int(row[k]) for k in row.asDict()}

    @property
    def commit_hash(self) -> str:
        hist = self.store.history()
        return hist[-1]["commit_hash"] if hist else ""

    def reference_commit_hash(self, order_col: str = "example_key") -> int:
        """The reference's Dataset.commit_hash (recon/dataset.py:104-106:
        dataset_hash over the example hashes in list order). A
        distributed table has no list order, so the caller names the
        ordering column; with an ingest-order column this reproduces the
        reference's pinned intdigests bit-exactly (tests/test_hash_parity).
        Collects only (order, hash) pairs — O(n) longs, not the data."""
        from recon_spark.hashing import HAVE_XXH3, dataset_hash

        if not HAVE_XXH3:
            raise RuntimeError("libxxhash not available; reference parity disabled")
        # secondary sort on the hash keeps the fold deterministic when
        # the order column has ties (e.g. the default example_key =
        # xxhash64(text) under duplicate texts); supply an explicit
        # ingest-order column to reproduce a reference list order exactly
        rows = (
            self._df.select(F.col(order_col).alias("o"), "example_hash")
            .orderBy("o", "example_hash")
            .collect()
        )
        return dataset_hash(self.name, (r["example_hash"] % (1 << 64) for r in rows))


class Corpus:
    """train/dev/test Dataset triple sharing a base directory
    (recon/corpus.py:13-52); ``apply`` runs a read-only fn per split and
    on the union (corpus.py:142-164)."""

    def __init__(self, name: str, splits: dict[str, DataFrame], base_dir: str):
        self.name = name
        self.datasets = {
            split: Dataset(f"{name}/{split}", df, f"{base_dir}/{split}")
            for split, df in splits.items()
        }

    def __getitem__(self, split: str) -> Dataset:
        return self.datasets[split]

    @property
    def all(self) -> DataFrame:
        dfs = [d.df for d in self.datasets.values()]
        out = dfs[0]
        for other in dfs[1:]:
            out = out.unionByName(other)
        return out

    def apply(self, fn: Callable[[DataFrame], DataFrame]) -> dict[str, object]:
        out: dict[str, object] = {
            split: fn(ds.df) for split, ds in self.datasets.items()
        }
        out["all"] = fn(self.all)
        return out
