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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Range join: every (point, interval) pair with
    ``start <= point <= end`` — the interval-overlap join Spark has no
    native operator for (a raw range predicate falls back to
    BroadcastNestedLoopJoin, i.e. a cartesian scan).

    Strategy (the classic interval-bucketing rewrite): explode each
    interval into the ``bucket``-sized cells it covers, map each point
    to its single cell, EQUI-join on the cell id, then apply the exact
    range filter. Each (point, interval) pair meets in exactly one
    cell — the point's own — so no post-join dedup is needed.

    Cost model at 100 TB: shuffle volume = |points| + |intervals| x
    avg_cells_per_interval, joined hash-partitioned on cell id. Pick
    ``bucket`` near the typical interval length: too small explodes the
    interval side, too large piles unrelated rows into shared cells.
    All columns must be disjoint between the two inputs; point/start/end
    are numeric (callers convert timestamps to epoch integers first).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"point/interval column names must be disjoint: {overlap}")
    b = int(bucket)
    # integer division (DIV), not float-divide-and-cast: at epoch-micros
    # magnitudes a double quotient can truncate to the wrong cell
    pts = points.withColumn("__cell", F.expr(f"{point_col} DIV {b}"))
    ivl = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(F.expr(f"{start_col} DIV {b}"), F.expr(f"{end_col} DIV {b}"))
        ),
    )
    return (
        pts.join(ivl, "__cell")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__cell")
    )
