"""spark-submit entry point for the BFS crawl (north_rule launch shape).

    spark-submit --py-files engine.zip jobs/crawl_job.py \
        --pages /data/pages --seeds /data/seeds --robots /data/robots \
        --checkpoint /data/checkpoints/run1 \
        [--max-rounds 20] [--default-budget 1000] [--fixture-n 0]

Tables are parquet (or any spark.read-able path) with the schemas in
SURVEY.md §1.4; with --fixture-n > 0 the deterministic synthetic corpus
is generated instead (smoke/demo mode). Re-running with the same
--checkpoint resumes from the last committed round with identical
remaining crawl ordering (north_rule).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages")
    ap.add_argument("--seeds")
    ap.add_argument("--robots")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--max-rounds", type=int, default=20)
    ap.add_argument("--default-budget", type=int, default=1000)
    ap.add_argument("--round-seconds", type=float, default=60.0)
    ap.add_argument("--no-robots", action="store_true",
                    help="reproduce the reference's ROBOTSTXT_OBEY=False")
    ap.add_argument("--fixture-n", type=int, default=0,
                    help="use the synthetic fixture corpus of this size")
    args = ap.parse_args()

    # spark-submit owns the session config; just get-or-create
    spark = SparkSession.builder.appName("biothings-crawler-spark").getOrCreate()

    from biothings_crawler_spark.fixtures import corpus
    from biothings_crawler_spark.oracle.bfs import CrawlConfig
    from biothings_crawler_spark.plans.crawl import run_crawl

    if args.fixture_n:
        pages = corpus.pages_df(spark, args.fixture_n)
        seeds = corpus.seeds_df(spark, args.fixture_n)
        robots = corpus.robots_df(spark)
        policies = corpus.gen_policies()
    else:
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        robots = spark.read.parquet(args.robots)
        policies = []

    cfg = CrawlConfig(
        max_rounds=args.max_rounds,
        default_budget=args.default_budget,
        round_seconds=args.round_seconds,
        obey_robots=not args.no_robots,
    )
    summary = run_crawl(spark, pages, seeds, robots, policies, args.checkpoint, cfg)
    print(json.dumps({"job": "crawl", **summary}))
    spark.stop()


if __name__ == "__main__":
    main()
