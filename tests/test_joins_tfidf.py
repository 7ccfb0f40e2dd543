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
