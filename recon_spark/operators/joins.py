"""As-of join: for each left row, the most recent right row at or
before its timestamp, per key — the time-series join Spark's DataFrame
API lacks natively (pandas-on-Spark merge_asof exists but routes
through a different engine path; this is the pure-DataFrame form).

Algorithm (union + tagged window, the scalable classic):
  1. union the two sides with a tag (right=0, left=1), right rows
     carrying their payload, left rows null payload
  2. one window per key ordered by (ts, tag, tie): running
     last non-null payload == most recent right row with
     right.ts <= left.ts (ties: right sorts before left at equal ts)
  3. keep left rows

Cost: ONE shuffle on the key (the window partition), versus the naive
equi-join + filter + argmax which materializes |L_k| x |R_k| rows per
key before reducing. Per-key partitions are bounded by that user's
events, so no salting needed; at 100 TB the shuffle is the same
hash-exchange any per-key window pays, and whole-stage codegen covers
the window operator (no Python anywhere).

The DuckDB oracle uses the engine's native ASOF JOIN — an independent
merge-based implementation — so parity is a genuine cross-engine check
of the semantics, not a replay of the same plan. Right rows must be
unique per (key, ts) for determinism; callers dedupe first (see
queries/pipeline.py:q_events_asof for the pattern).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``prefix``-named columns
    holding the payload of the latest right row with
    ``right[on] <= left[on]`` and equal ``by`` key (nulls when no such
    row). Left columns pass through unchanged."""
    rp = [F.col(c).alias(f"{prefix}{c}") for c in right_cols]
    r = right.select(
        F.col(by),
        F.col(on).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(F.col(on).alias(f"{prefix}{on}"), *rp).alias("__payload"),
        *[F.lit(None).cast(t.dataType).alias(t.name) for t in left.schema if t.name != by],
    )
    l = left.select(
        F.col(by),
        F.col(on).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[c for c in left.columns if c != by],
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = [by] + [c for c in left.columns if c != by]
    return u.where(F.col("__tag") == 1).select(
        *out_cols,
        F.col(f"__match.{prefix}{on}").alias(f"{prefix}{on}"),
        *[F.col(f"__match.{prefix}{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
