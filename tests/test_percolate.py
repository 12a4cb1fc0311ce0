"""Prospective search / percolation (operators/percolate)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.percolate import prospective_match


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "breaking data leak at example corp"),
            (2, "data data data"),          # dup terms count once
            (3, "nothing relevant here"),
            (4, "leak of data and more data leak"),
        ],
        "id long, text string",
    )
    qs = spark.createDataFrame(
        [
            ("q_leak", ["data", "leak"]),
            ("q_data", ["data"]),
            ("q_dup", ["data", "data", "leak"]),   # dup in query: 2 terms
            ("q_none", ["data", "zzghost"]),
        ],
        "query_id string, terms array<string>",
    )
    return docs, qs


def test_conjunction_semantics(spark):
    docs, qs = _fixture(spark)
    got = {(r.id, r.query_id): (r.n_matched, r.n_terms)
           for r in prospective_match(docs, qs, "id", "text").collect()}
    assert got == {
        (1, "q_leak"): (2, 2), (4, "q_leak"): (2, 2),
        (1, "q_data"): (1, 1), (2, "q_data"): (1, 1), (4, "q_data"): (1, 1),
        (1, "q_dup"): (2, 2), (4, "q_dup"): (2, 2),
        # q_none never satisfied (ghost term); doc 3 matches nothing
    }


def test_min_should_relaxation(spark):
    docs, qs = _fixture(spark)
    got = {(r.id, r.query_id)
           for r in prospective_match(docs, qs, "id", "text",
                                      min_should=1).collect()}
    # 1-of-n: every doc containing ANY query term matches, incl. q_none
    assert (2, "q_none") in got and (1, "q_none") in got
    assert (3, "q_leak") not in got


def test_plan_broadcasts_and_prunes(spark):
    docs, qs = _fixture(spark)
    plan = (
        prospective_match(docs, qs, "id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "Window" not in plan
    assert "BroadcastHashJoin" in plan
    # the watched-term semi-join prunes before the match join
    assert "LeftSemi" in plan
