"""Bucketed co-located joins: both sides bucketed by the join key ->
SortMergeJoin with zero shuffle on either side."""

from pyspark.sql import functions as F

from biothings_crawler_spark.bucketing import read_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    pages = spark.range(20_000).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("<html>"), F.col("id").cast("string")).alias("html"),
    )
    frontier = spark.range(0, 20_000, 3).select(
        F.col("id").alias("url_hash"),
        (F.col("id") % 5).cast("int").alias("priority"),
    )
    write_bucketed(pages, "t_pages_b", "url_hash", 8, path=str(tmp_path / "p"))
    write_bucketed(frontier, "t_frontier_b", "url_hash", 8, path=str(tmp_path / "f"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "t_frontier_b").join(
            read_bucketed(spark, "t_pages_b"), "url_hash")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # layout satisfies distribution
        assert j.count() == 6667
        # control: the same join on unbucketed reads DOES shuffle
        pu = spark.read.parquet(str(tmp_path / "p"))
        fu = spark.read.parquet(str(tmp_path / "f"))
        plan_u = fu.join(pu, "url_hash")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan_u
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_pages_b")
        spark.sql("DROP TABLE IF EXISTS t_frontier_b")
