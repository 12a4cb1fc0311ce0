"""Exact distributed quantiles via histogram range-narrowing."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.quantiles import exact_quantiles


def _vals(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "x long")


def test_small_list_matches_sorted_rank(spark):
    xs = [5, 1, 9, 3, 7, 7, 2, 8, 4, 6]          # n=10, sorted 1..9 w/ dup 7
    got = {r.q_ppm: (r.n, r.rank, r.value) for r in exact_quantiles(
        _vals(spark, xs), "x", [100000, 500000, 1000000]).collect()}
    s = sorted(xs)
    assert got[100000] == (10, 1, s[0])           # ceil(0.1*10)=1
    assert got[500000] == (10, 5, s[4])           # rank 5 -> 5th smallest
    assert got[1000000] == (10, 10, s[9])


def test_wide_range_forces_multiple_passes(spark):
    # values spread over ~2^40 so the first pass cannot be the endgame
    # even with 1024 bins; check against python's exact answer
    xs = [(i * 1099511627776 + i * i * 31) % (1 << 40) for i in range(500)]
    q = [250000, 750000, 990000]
    got = {r.q_ppm: r.value for r in exact_quantiles(
        _vals(spark, xs), "x", q, bins=64).collect()}
    s = sorted(xs)
    for qp in q:
        k = max(1, min(len(xs), (qp * len(xs) + 999999) // 1000000))
        assert got[qp] == s[k - 1], qp


def test_duplicates_and_negative_values(spark):
    xs = [-5] * 40 + [0] * 30 + [17] * 30
    got = {r.q_ppm: r.value for r in exact_quantiles(
        _vals(spark, xs), "x", [300000, 500000, 800000]).collect()}
    assert got[300000] == -5      # rank 30 inside the -5 run
    assert got[500000] == 0       # rank 50 inside the 0 run
    assert got[800000] == 17      # rank 80 inside the 17 run


def test_single_value_and_empty(spark):
    got = exact_quantiles(_vals(spark, [42]), "x", [500000]).collect()
    assert [(r.n, r.rank, r.value) for r in got] == [(1, 1, 42)]
    assert exact_quantiles(_vals(spark, []), "x", [500000]).count() == 0


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (3,), (None,), (5,)],
                               "x long")
    got = exact_quantiles(df, "x", [500000]).collect()[0]
    assert (got.n, got.rank, got.value) == (3, 2, 3)
