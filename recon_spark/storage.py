"""Snapshot table storage: versioned writes, idempotent MERGE, rollback.

The design target is Iceberg (snapshots, MERGE INTO, rollback_to_snapshot
— SURVEY.md §2.7); the sandbox has no Iceberg runtime jars, so this module
implements the same observable semantics over parquet + a JSON manifest,
behind one small seam (``SnapshotStore``). Swapping in Iceberg replaces
each method body with a catalog call and keeps every caller unchanged.

Semantics preserved from the reference:
- content-addressed dedupe on write (ExampleStore.add keeps the first
  copy per hash, recon/store.py:39-47) -> ``merge`` is insert-if-absent
  on the key, so re-running a pipeline step is a no-op (checkpointed
  resume, recon/dataset.py:353-382)
- per-operation lineage row with added/removed/changed counts
  (OperationState, recon/types.py:256-266; counts semantics of
  recon/operations.py:239-256) -> ``_ops_log`` table, diffs computed by
  key/hash anti-joins, never UDF side effects
- rollback(n) restores the pre-op table (recon/dataset.py:240-289) ->
  manifest ``current`` pointer moves; snapshots are immutable
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class OpResult:
    snapshot_id: int
    added: int
    removed: int
    changed: int


class SnapshotStore:
    """A versioned table rooted at ``base_dir`` keyed by ``key_col`` with a
    content-hash column ``hash_col`` (any deterministic per-row hash)."""

    def __init__(self, spark: SparkSession, base_dir: str, key_col: str, hash_col: str):
        self.spark = spark
        self.base = base_dir
        self.key_col = key_col
        self.hash_col = hash_col
        os.makedirs(base_dir, exist_ok=True)

    # --- manifest -----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base, "_manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": [], "current": None}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)

    # --- reads --------------------------------------------------------------

    def current_snapshot_id(self) -> int | None:
        return self._read_manifest()["current"]

    def read(self, snapshot_id: int | None = None) -> DataFrame | None:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return None
        return self.spark.read.parquet(os.path.join(self.base, f"snap_{sid}"))

    def history(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def completed_ops(self) -> set[str]:
        return {
            s["op_name"]
            for s in self._read_manifest()["snapshots"]
            if s.get("status") == "COMPLETED"
        }

    # --- writes -------------------------------------------------------------

    def _commit_hash(self, df: DataFrame) -> str:
        """Order-insensitive dataset identity: bit_xor of per-row xxhash64
        over (key, content hash) — the Spark analog of the reference's
        commit_hash (recon/hashing.py:88-100); xor is commutative and
        cannot overflow, so it is safe at any scale under ANSI mode."""
        row = df.select(
            F.expr(f"bit_xor(xxhash64({self.key_col}, {self.hash_col}))").alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return f"{row['h']}:{row['n']}"

    def write_snapshot(self, df: DataFrame, op_name: str, args: str = "") -> OpResult:
        """Write df as the new current snapshot, logging lineage diffs
        (added/removed/changed by key+hash anti-joins) vs the previous one."""
        m = self._read_manifest()
        prev = self.read()
        sid = (m["current"] or 0) + 1
        path = os.path.join(self.base, f"snap_{sid}")
        df.write.mode("overwrite").parquet(path)
        new = self.spark.read.parquet(path)

        if prev is None:
            added, removed, changed = new.count(), 0, 0
        else:
            pk = prev.select(
                F.col(self.key_col).alias("k"), F.col(self.hash_col).alias("h_prev")
            )
            nk = new.select(
                F.col(self.key_col).alias("k"), F.col(self.hash_col).alias("h_new")
            )
            j = nk.join(pk, "k", "full_outer")
            row = j.agg(
                F.sum(F.col("h_prev").isNull().cast("long")).alias("added"),
                F.sum(F.col("h_new").isNull().cast("long")).alias("removed"),
                F.sum(
                    (
                        F.col("h_prev").isNotNull()
                        & F.col("h_new").isNotNull()
                        & (F.col("h_prev") != F.col("h_new"))
                    ).cast("long")
                ).alias("changed"),
            ).collect()[0]
            added, removed, changed = row["added"] or 0, row["removed"] or 0, row["changed"] or 0

        m["snapshots"].append(
            {
                "id": sid,
                "op_name": op_name,
                "args": args,
                "status": "COMPLETED",
                "ts": time.time(),
                "commit_hash": self._commit_hash(new),
                "added": added,
                "removed": removed,
                "changed": changed,
            }
        )
        m["current"] = sid
        self._write_manifest(m)
        return OpResult(sid, added, removed, changed)

    def merge(self, new_rows: DataFrame, op_name: str = "merge") -> OpResult:
        """Idempotent MERGE: insert rows whose key is absent; existing keys
        keep their stored version (first-copy-wins, like ExampleStore.add).
        Re-running the same merge adds 0 rows -> resume is a no-op."""
        prev = self.read()
        if prev is None:
            out = new_rows.dropDuplicates([self.key_col])
        else:
            fresh = new_rows.dropDuplicates([self.key_col]).join(
                prev.select(self.key_col), self.key_col, "left_anti"
            )
            out = prev.unionByName(fresh)
        return self.write_snapshot(out, op_name)

    def rollback(self, n: int = 1) -> int:
        """Move the current pointer back n snapshots (history retained)."""
        m = self._read_manifest()
        ids = [s["id"] for s in m["snapshots"]]
        if m["current"] is None or m["current"] not in ids:
            raise ValueError("nothing to roll back")
        idx = ids.index(m["current"]) - n
        if idx < 0:
            raise ValueError(f"cannot roll back {n} snapshots; history={len(ids)}")
        m["current"] = ids[idx]
        self._write_manifest(m)
        return m["current"]


def ops_log_df(spark: SparkSession, store: SnapshotStore) -> DataFrame:
    """The lineage table as a DataFrame (OPS_LOG_SCHEMA analog)."""
    rows = [
        (
            s["op_name"],
            s["status"],
            float(s["ts"]),
            s.get("args", ""),
            int(s["added"]),
            int(s["removed"]),
            int(s["changed"]),
            s["commit_hash"],
            int(s["id"]),
        )
        for s in store.history()
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "op_name string, status string, ts double, args string, "
            "examples_added long, examples_removed long, examples_changed long, "
            "commit_hash string, snapshot_id long"
        ),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize a hash-bucketed (optionally sorted) managed table —
    the co-located-join primitive: two tables bucketed on the same key
    with the same bucket count join WITHOUT a shuffle (each task reads
    matching buckets from both sides; the SMJ sort is additionally
    elided only when every bucket holds a single sorted file — a
    multi-partition writer produces several files per bucket and Spark
    re-sorts, so only the Exchange elision is load-bearing here).
    The Iceberg analog is a bucket partition transform; here it is
    Spark's native bucketBy catalog table (plan audited in
    tests/test_plans.py). Use for the tables every pipeline stage joins
    on the same key — pages/mentions/triples on url or doc_id hash."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
