"""Count-Min sketch (operators/sketch.countmin_*)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.sketch import (
    CM_D,
    CM_W,
    countmin_build,
    countmin_estimate,
)


def _stream(spark):
    # 'hot' x200, 'h<i>' x1 for 300 distinct cold keys
    hot = spark.range(200).select(F.lit("hot").alias("v"))
    cold = spark.range(300).select(F.concat(F.lit("h"), "id").alias("v"))
    return hot.union(cold)


def test_estimate_is_conservative_and_tight_for_heavy_hitter(spark):
    s = _stream(spark)
    sketch = countmin_build(s, "v")
    exact = {r.v: r.n for r in s.groupBy("v").agg(F.count("*").alias("n")).collect()}
    est = {
        r.value: r.estimate
        for r in countmin_estimate(sketch, s.distinct(), "v").collect()
    }
    assert all(est[k] >= exact[k] for k in exact)  # never underestimates
    # 500 total inserts over 4x512 counters: the hot key's min-counter
    # carries at most a few colliding singletons
    assert exact["hot"] == 200 and est["hot"] <= 230


def test_sketch_is_bounded_and_mergeable(spark):
    a = spark.range(500).select(F.concat(F.lit("k"), F.col("id") % 50).alias("v"))
    b = spark.range(300).select(F.concat(F.lit("k"), F.col("id") % 30).alias("v"))
    sa, sb = countmin_build(a, "v"), countmin_build(b, "v")
    assert sa.count() <= CM_D * CM_W
    merged = sa.union(sb).groupBy("r", "c").agg(F.sum("n").alias("n"))
    direct = countmin_build(a.union(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_unseen_key_estimate_can_be_zero(spark):
    sketch = countmin_build(_stream(spark), "v")
    keys = spark.createDataFrame([("never-seen-xyz",)], "v string")
    e = countmin_estimate(sketch, keys, "v").collect()[0]
    assert e.estimate >= 0  # zero unless all 4 counters collide


def test_plan_broadcasts_sketch(spark):
    s = _stream(spark)
    sketch = countmin_build(s, "v")
    plan = (
        countmin_estimate(sketch, s.distinct(), "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
