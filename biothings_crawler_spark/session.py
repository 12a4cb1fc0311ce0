"""SparkSession factory with defaults tuned for the crawl workload.

Local testing runs ``local[N]`` (one JVM); the configs are chosen so the
same code is correct on a 1000-executor cluster:

* AQE on (runtime coalesce + skew-join splitting) — hot-host skew is the
  dominant risk at 10^10-frontier scale (SURVEY.md §4).
* Arrow enabled — every Python extraction/transform runs as a vectorized
  pandas UDF over Arrow batches, never per-row Python
  (BASELINE.json input_hint).
* UTC session timezone — DuckDB oracle comparison is TZ-naive-UTC.
* shuffle partitions default to cores locally; on a real cluster AQE's
  coalesce makes the initial number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "biothings-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # runtime bloom-filter join pruning helps the seen-set anti-join
        # even before our persistent bloom segments kick in
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
