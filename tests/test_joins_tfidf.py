"""As-of join semantics (goldens: strict-before, tie-at-equal-ts,
no-match) + tf-idf golden + oracle parity for both queries."""

import datetime as dt
import math

import pytest

from tests.conftest import SF_SMOKE, compare_query

from recon_spark.operators.joins import asof_join
from recon_spark.operators.textstats import tfidf_top_terms
from recon_spark.queries.pipeline import ORACLES, QUERIES


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5), 100.0),   # matches right at ts=3
            (2, 10, _ts(2), 200.0),   # matches right at ts=1
            (3, 10, _ts(3), 300.0),   # equal ts -> right at ts=3 matches
            (4, 20, _ts(9), 400.0),   # user 20 has no right rows
            (5, 30, _ts(1), 500.0),   # right exists only LATER -> no match
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(1), 11.0),
            (10, _ts(3), 33.0),
            (10, _ts(7), 77.0),  # after every left ts for user 10
            (30, _ts(5), 55.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, right_cols=("value",)).collect()
    }
    assert got[1] == (_ts(3), 33.0)
    assert got[2] == (_ts(1), 11.0)
    assert got[3] == (_ts(3), 33.0)  # right.ts == left.ts counts as "at or before"
    assert got[4] == (None, None)
    assert got[5] == (None, None)
    # left columns pass through unchanged
    rows = {r["event_id"]: r for r in asof_join(left, right).collect()}
    assert rows[1]["value"] == 100.0 and rows[1]["ts"] == _ts(5)


def test_asof_join_single_shuffle_no_python(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5), 1.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [(10, _ts(1), 2.0)], "user_id long, ts timestamp, value double"
    )
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one hash exchange for the window partition (+ AQE may show reads);
    # crucially no join operator at all — the asof is a window, not a join
    assert "Join" not in plan


def test_tfidf_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(df, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score"]) for r in rows}
    n = 3.0
    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert got[(1, 1)] == ("apple", round(2 * math.log(n / 1), 6))
    assert got[(1, 2)] == ("banana", round(1 * math.log(n / 2), 6))
    # doc 3: durian (tf=1, df=1) beats cherry (tf=2, df=2)?
    d_durian = round(1 * math.log(n / 1), 6)
    d_cherry = round(2 * math.log(n / 2), 6)
    top = ("durian", d_durian) if d_durian > d_cherry else ("cherry", d_cherry)
    assert got[(3, 1)] == top


@pytest.mark.parametrize("name", ["events_asof", "tfidf_terms"])
def test_asof_tfidf_oracles(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name], SF_SMOKE)


def test_interval_join_golden(spark):
    from recon_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 25), (4, 99)], "pt_id long, p long"
    )
    ivl = spark.createDataFrame(
        [(100, 0, 10), (200, 9, 30), (300, 50, 60)], "ivl_id long, s long, e long"
    )
    got = sorted(
        (r["pt_id"], r["ivl_id"])
        for r in interval_join(points, ivl, "p", "s", "e", bucket=7).collect()
    )
    # p=5 in [0,10]; p=10 in [0,10] AND [9,30]; p=25 in [9,30]; p=99 nowhere
    assert got == [(1, 100), (2, 100), (2, 200), (3, 200)]


def test_interval_join_rejects_column_overlap(spark):
    from recon_spark.operators.joins import interval_join

    df = spark.createDataFrame([(1, 2)], "a long, p long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(df, df, "p", "a", "p", bucket=10)


def test_interval_join_is_equi_join_not_nested_loop(spark):
    from recon_spark.operators.joins import interval_join

    points = spark.createDataFrame([(1, 5)], "pt_id long, p long")
    ivl = spark.createDataFrame([(100, 0, 10)], "ivl_id long, s long, e long")
    plan = (
        interval_join(points, ivl, "p", "s", "e", bucket=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the whole point: a hash join on the cell id, never a nested loop
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_kmv_distinct_accuracy(spark):
    from recon_spark.operators.sketches import kmv_distinct

    df = spark.range(0, 20000).withColumnRenamed("id", "key")
    row = kmv_distinct(df, "key", k=64).collect()[0]
    assert row["n_exact"] == 20000
    # bottom-64 estimator: expect well within +-3/sqrt(k) ~ 37%
    assert abs(row["rel_err_pct"]) < 37.0
    # fallback branch: fewer distinct values than k -> exact
    small = spark.range(0, 10).withColumnRenamed("id", "key")
    srow = kmv_distinct(small, "key", k=64).collect()[0]
    assert srow["est_distinct"] == 10.0 and srow["n_exact"] == 10


@pytest.mark.parametrize("name", ["events_range_join", "distinct_sketch"])
def test_range_sketch_oracles(spark, ddb, name):
    compare_query(spark, ddb, QUERIES[name], ORACLES[name], SF_SMOKE)
