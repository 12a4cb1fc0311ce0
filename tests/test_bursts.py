"""Hysteresis-EWMA burst intervals (operators/bursts)."""

from biothings_crawler_spark.operators.bursts import burst_intervals


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "term string, hour_no long, n long")
    return [
        tuple(r)
        for r in burst_intervals(df, **kw)
        .orderBy("term", "burst_no")
        .collect()
    ]


def test_single_burst_with_freeze_and_exit(spark):
    # baseline 10/hour, spike to 30 for three hours, back to 10.
    rows = [("a", h, 10) for h in range(5)]
    rows += [("a", h, 30) for h in range(5, 8)]
    rows += [("a", h, 10) for h in range(8, 10)]
    # ewma stays 1000 centi through h0-h4; 30*10000 >= 200*1000 enters
    # at h5; baseline FROZEN at 1000 so h6, h7 stay in; h8 n=10 ->
    # 10*10000 < 100*1000 is false (equal) ... 100000 < 100000 false ->
    # stays in at 10? Exit needs n*100 strictly below ewma: 1000 == 1000
    # -> no exit; series ends in-burst and closes at the last hour.
    assert _run(spark, rows) == [("a", 1, 5, 9)]


def test_exit_closes_at_previous_hour(spark):
    rows = [("a", h, 10) for h in range(5)]
    rows += [("a", 5, 30), ("a", 6, 30), ("a", 7, 5), ("a", 8, 5)]
    # h7 n=5: 5*10000 < 100*1000 -> exit, interval closes at h6
    assert _run(spark, rows) == [("a", 1, 5, 6)]


def test_first_observation_never_bursts(spark):
    # huge first hour only seeds the baseline
    rows = [("a", 0, 1000), ("a", 1, 1000), ("a", 2, 1000)]
    assert _run(spark, rows) == []


def test_two_separate_bursts_numbered(spark):
    rows = [("a", h, 10) for h in range(3)]
    rows += [("a", 3, 40), ("a", 4, 2), ("a", 5, 10), ("a", 6, 40),
             ("a", 7, 2)]
    out = _run(spark, rows)
    assert [(t, b) for t, b, *_ in out] == [("a", 1), ("a", 2)]
    assert out[0][2:] == (3, 3) and out[1][2:] == (6, 6)


def test_no_burst_no_rows_and_multi_term(spark):
    rows = [("quiet", h, 10) for h in range(6)]
    rows += [("hot", h, 10) for h in range(3)] + [("hot", 3, 50)]
    out = _run(spark, rows)
    assert out == [("hot", 1, 3, 3)]


def test_plan_fold_no_corpus_window(spark):
    df = spark.createDataFrame(
        [("a", h, 10) for h in range(4)], "term string, hour_no long, n long"
    )
    plan = (
        burst_intervals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    # the only Window is per-term numbering over interval rows
    assert plan.count("Window") <= 1


def test_ewma_integer_division_past_2_53(spark):
    # Regression: the EWMA update must floor-divide in INTEGER semantics
    # (matching the oracle's `// 100`).  With counts this large the EWMA
    # after hour 1 is ~4.2e16 (> 2^53); double `/` + floor lands 2 low,
    # and this n2 sits exactly in the gap: integer semantics enter a
    # burst at hour 2, double semantics miss it.  All comparisons stay
    # inside int64 (ent*ewma <= 9.2e18).
    rows = [
        ("a", 0, 450_000_000_000_008),
        ("a", 1, 13),
        ("a", 2, 630_000_000_000_019),
        ("a", 3, 1),
        ("a", 4, 1),
    ]
    assert _run(spark, rows) == [("a", 1, 2, 2)]
