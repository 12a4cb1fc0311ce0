"""Error-budget burn-rate alerting over an event stream — the
multi-window, multi-burn-rate pattern from the public Google SRE
Workbook (ch. 5, "Alerting on SLOs"), recast as a batch DataFrame
operator for crawl-fleet health (per-service fetch-error SLOs).

Reference parity note: biothings.crawler logs per-request failures but
has no SLO plane; this is part of the large-scale pipeline extension
(a 1000-executor crawl needs budget-burn alerts, not raw error logs).

Semantics (integer-exact, oracle-replayable):

* events land in tumbling SHORT buckets of ``short_secs`` via
  ``floor(unix_ts / short_secs)`` — one hash aggregation keyed on
  (key, bucket) does all the heavy lifting, map-side combinable;
* the LONG window at each short bucket is the trailing
  ``long_buckets`` short buckets, computed with a RANGE frame over the
  bucket index — missing buckets contribute nothing, exactly as a
  time-based trailing window should;
* burn rate in exact milli-units: with SLO target ``slo_ppm`` (ppm of
  requests that must be good), the error budget is
  ``budget_ppm = 10^6 - slo_ppm`` and

      burn_milli = ((errors * 10^6) div total) * 1000 div budget_ppm

  (floor at each step — both engines replay the same chain);
* a row ALERTS when BOTH windows burn at >= ``thr_milli`` — the
  workbook's two-window guard: the long window proves budget impact,
  the short window proves it is still happening.

Scale shape: one hash agg over raw events, then ONE window pass over
the (key, bucket) series — |keys| * |time-span / short_secs| rows,
partitioned by key, never over raw events.  No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def slo_burn_alerts(
    events: DataFrame,
    ts_col: str,
    error_col: str,
    key_col: str,
    short_secs: int = 21600,
    long_buckets: int = 4,
    slo_ppm: int = 800_000,
    thr_milli: int = 1000,
) -> DataFrame:
    """Per-(key, short-bucket) burn rates plus the two-window alert
    flag.  ``error_col`` must be a boolean column; ``slo_ppm`` is the
    good-event target in parts-per-million.

    Returns (key, bucket, errors, total, burn_short_milli,
    errors_long, total_long, burn_long_milli, alert).
    """
    budget_ppm = 1_000_000 - slo_ppm
    if budget_ppm <= 0:
        raise ValueError("slo_ppm must leave a non-zero error budget")

    # timestampdiff from a fixed NTZ epoch: timezone-free integer
    # seconds, identical to the DuckDB oracle's epoch_us // 10^6
    per = (
        events.select(
            F.col(key_col).cast("long").alias("key"),
            F.expr(
                f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                f" {ts_col}) div {short_secs}L"
            ).alias("bucket"),
            F.col(error_col).cast("long").alias("_err"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.sum("_err").cast("long").alias("errors"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
    )
    w = (
        Window.partitionBy("key").orderBy("bucket")
        .rangeBetween(-(long_buckets - 1), 0)
    )
    burn = (
        "(({e} * 1000000L) div {t}) * 1000L div {b}L"
    )
    return (
        per.select(
            "key", "bucket", "errors", "total",
            F.sum("errors").over(w).cast("long").alias("errors_long"),
            F.sum("total").over(w).cast("long").alias("total_long"),
        )
        .select(
            "key", "bucket", "errors", "total",
            F.expr(burn.format(e="errors", t="total", b=budget_ppm))
            .alias("burn_short_milli"),
            "errors_long", "total_long",
            F.expr(burn.format(e="errors_long", t="total_long",
                               b=budget_ppm))
            .alias("burn_long_milli"),
        )
        .select(
            "*",
            (
                (F.col("burn_short_milli") >= thr_milli)
                & (F.col("burn_long_milli") >= thr_milli)
            ).alias("alert"),
        )
    )
