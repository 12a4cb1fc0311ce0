"""Term-proximity retrieval (operators/serving.proximity_topk)."""

import pytest

from biothings_crawler_spark.operators.serving import proximity_topk


def _run(spark, rows, terms, k=10):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.id: r.prox
            for r in proximity_topk(df, "doc_id", "text", terms, k).collect()}


def test_min_gap_and_scoring(spark):
    got = _run(spark, [
        (1, "hash join here"),               # gap 1 -> 1e6
        (2, "hash x join"),                  # gap 2 -> 250000
        (3, "hash x x x x x x x x x join"),  # gap 10 -> 10000
        (4, "hash only here"),               # missing 'join' -> dropped
        (5, "join hash"),                    # order-free |i-j| -> 1e6
    ], ["hash", "join"])
    assert got == {1: 10**6, 5: 10**6, 2: 250_000, 3: 10_000}


def test_min_over_all_occurrence_pairs(spark):
    """Several occurrences: the MINIMUM gap wins, not the first."""
    got = _run(spark, [(1, "hash x x x join x hash join")],
               ["hash", "join"])
    assert got[1] == 10**6  # the trailing adjacent pair


def test_three_term_query_sums_adjacent_pairs(spark):
    got = _run(spark, [
        (1, "hash join scan"),        # both pairs gap 1 -> 2e6
        (2, "hash join x x scan"),    # 1e6 + 1e6//9
        (3, "join scan nothing"),     # first pair incomplete: only pair2
    ], ["hash", "join", "scan"])
    assert got[1] == 2 * 10**6
    assert got[2] == 10**6 + 10**6 // 9
    assert got[3] == 10**6


def test_empty_and_null_docs_drop(spark):
    got = _run(spark, [(1, ""), (2, None), (3, "hash join")],
               ["hash", "join"])
    assert got == {3: 10**6}


def test_requires_two_terms(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        proximity_topk(df, "doc_id", "text", ["solo"])


def test_plan_no_positional_self_join(spark):
    """The corpus side is one projection — no join, no window; the
    only exchange is the final top-k."""
    df = spark.createDataFrame([(1, "hash join")], "doc_id long, text string")
    plan = proximity_topk(df, "doc_id", "text", ["hash", "join"]) \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "Window",
                "BatchEvalPython"):
        assert bad not in plan
    assert "TakeOrderedAndProject" in plan
