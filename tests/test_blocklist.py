"""Domain blocklist filtering (operators/blocklist.blocklist_filter)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.blocklist import (
    blocklist_filter,
    suffix_at_level,
)


def _bl(spark):
    return spark.createDataFrame(
        [("bad.example.org",), ("evil.net",)], "domain string"
    )


def test_label_boundary_matching(spark):
    frontier = spark.createDataFrame(
        [
            ("bad.example.org",),        # exact -> blocked
            ("www.bad.example.org",),    # subdomain -> blocked
            ("a.b.bad.example.org",),    # deep subdomain -> blocked
            ("notbad.example.org",),     # substring only -> kept
            ("example.org",),            # parent of an entry -> kept
            ("x.evil.net",),             # subdomain of bare eTLD+1 -> blocked
            ("good.org",),
        ],
        "host string",
    )
    kept = {r.host for r in blocklist_filter(frontier, _bl(spark)).collect()}
    assert kept == {"notbad.example.org", "example.org", "good.org"}


def test_suffix_at_level_null_past_depth(spark):
    df = spark.range(1).select(
        *[suffix_at_level(F.lit("a.b.c"), i).alias(f"s{i}") for i in range(4)]
    )
    r = df.collect()[0]
    assert (r.s0, r.s1, r.s2, r.s3) == ("a.b.c", "b.c", "c", None)


def test_plan_is_broadcast_anti_no_exchange_on_frontier(spark):
    frontier = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".example.org")).alias("host")
    )
    plan = (
        blocklist_filter(frontier, _bl(spark), max_levels=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # blocklist broadcasts; the frontier side must not shuffle
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan
