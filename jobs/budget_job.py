"""spark-submit entry point for the ADAPTIVE POLITENESS plane
(north_rule launch shape): fold the previous rounds' fetch log into
next round's per-host budgets, ready for jobs/crawl_job.py /
operators.politeness.select_politely.

    spark-submit --py-files engine.zip jobs/budget_job.py \
        --fetch-log /data/fetch_log --out /data/budgets \
        [--round-seconds 600] [--min-budget 1] [--fixture-n 0]

Composition (operators/politeness.adaptive_budgets): the fetch log
reduces map-side to hourly backpressure flags (AIMD fold — halve on a
429/5xx hour, additive increase on a clean hour) and to the 64-bin
log2 latency histogram (p95 upper bound); budget = clamp(min(rate,
round/p95), min_budget).  Both aggregates are bounded per host, so the
job's cost is one pass over the log plus host-bounded folds — nothing
scales with the key space except the output table itself.

The fetch log schema is (host string, ts timestamp, status int,
latency_us long).  With --fixture-n > 0 a deterministic synthetic log
of that many rows is generated instead (smoke/demo mode).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def fixture_log(spark: SparkSession, n: int):
    """Deterministic synthetic fetch log: 40 hosts, ~7% backpressure,
    latencies spread over ~20 log2 bins."""
    return spark.range(n).select(
        F.concat(F.lit("h"), (F.col("id") % 40).cast("string")).alias("host"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % 86_400)
        ).alias("ts"),
        F.when((F.col("id") * 2654435761) % 100 < 7, F.lit(429))
        .otherwise(F.lit(200))
        .alias("status"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1_000_000)) + 500).alias(
            "latency_us"
        ),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fetch-log")
    ap.add_argument("--out", required=True)
    ap.add_argument("--round-seconds", type=int, default=600)
    ap.add_argument("--min-budget", type=int, default=1)
    ap.add_argument("--fixture-n", type=int, default=0)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("biothings-crawler-budgets").getOrCreate()

    from biothings_crawler_spark.operators.politeness import adaptive_budgets

    log = (
        fixture_log(spark, args.fixture_n)
        if args.fixture_n
        else spark.read.parquet(args.fetch_log)
    )
    budgets = adaptive_budgets(
        log, "host", "ts", "status", "latency_us",
        round_seconds=args.round_seconds, min_budget=args.min_budget,
    )
    budgets.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    print(json.dumps({
        "n_hosts": out.count(),
        "total_budget": out.agg(F.sum("budget")).collect()[0][0],
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
