"""Compaction planner (operators/maintenance.compaction_plan)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.maintenance import compaction_plan


def _manifest(spark, rows):
    return spark.createDataFrame(
        rows, "part string, file_id long, size_bytes long")


def test_packing_and_keep(spark):
    plan = {r.file_id: r for r in compaction_plan(_manifest(spark, [
        ("a", 1, 90), ("a", 2, 80), ("a", 3, 40), ("a", 4, 10),
        ("a", 5, 150),  # >= target: kept
        ("b", 6, 30),
    ]), target_bytes=100).collect()}
    assert plan[5].action == "keep" and plan[5].group_no is None
    # big-first order in part a: 90(cum 90,g0) 80(cum170,g0) 40(cum210,g1) 10(cum220,g2)
    assert (plan[1].group_no, plan[2].group_no) == (0, 0)
    assert plan[1].group_bytes == 170 and plan[1].group_files == 2
    assert plan[3].group_no == 1 and plan[4].group_no == 2
    assert plan[6].group_no == 0 and plan[6].group_files == 1


def test_single_exchange(spark):
    plan = compaction_plan(_manifest(spark, [("a", 1, 10)]), 100)
    s = plan._jdf.queryExecution().executedPlan().toString()
    # the compact branch: one hash-partition exchange on part; the
    # per-group window rides the same clustering (sort only)
    assert s.count("Exchange hashpartitioning") == 1


def test_group_invariants(spark):
    rows = [("p", i, 10 + (i * 37) % 90) for i in range(200)]
    plan = compaction_plan(_manifest(spark, rows), 256)
    g = (plan.filter(F.col("action") == "compact")
         .select("group_no", "group_bytes").distinct().collect())
    nos = sorted(r.group_no for r in g)
    assert nos == list(range(len(nos)))  # contiguous group numbering
    # boundary packing: overshoot bounded by one file (< target each)
    assert all(r.group_bytes < 2 * 256 for r in g)
    total = sum(r.group_bytes for r in g)
    assert total == sum(s for (_, _, s) in rows)


def test_erasure_impact_lanes(spark):
    from biothings_crawler_spark.operators.maintenance import (
        erasure_impact,
    )

    docs = [
        (1, "shared content a"), (2, "shared content a"),
        (3, "shared content a"),
        (10, "solo content b"),
        (20, "pair c"), (21, "pair c"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    erased = spark.createDataFrame(
        [(1,), (10,), (20,), (21,)], "doc_id long")
    got = {r["id"]: r for r in erasure_impact(d, erased).collect()}
    # winner of a 3-cluster erased -> re-elect min survivor (2)
    assert (got[1]["was_winner"], got[1]["new_winner"],
            got[1]["group_size"]) == (1, 2, 3)
    # singleton erased -> content leaves, no new winner
    assert (got[10]["was_winner"], got[10]["new_winner"]) == (1, None)
    # whole pair erased -> winner row has NULL re-election,
    # non-winner row carries no election duty
    assert (got[20]["was_winner"], got[20]["new_winner"]) == (1, None)
    assert (got[21]["was_winner"], got[21]["new_winner"]) == (0, None)
    # postings accounting = distinct words
    assert got[10]["n_index_rows"] == 3
    # non-erased docs emit no rows
    assert set(got) == {1, 10, 20, 21}


def test_erasure_impact_null_text_is_singleton(spark):
    from biothings_crawler_spark.operators.maintenance import (
        erasure_impact,
    )

    d = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text")],
        "doc_id long, text string")
    erased = spark.createDataFrame([(1,)], "doc_id long")
    got = {r["id"]: r for r in erasure_impact(d, erased).collect()}
    # NULL-text docs never cluster with each other (review finding)
    assert (got[1]["group_size"], got[1]["was_winner"],
            got[1]["new_winner"], got[1]["n_index_rows"]) == (1, 1, None, 0)
