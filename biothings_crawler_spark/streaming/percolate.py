"""Streaming percolation — standing subscriptions matched against the
LIVE document stream (the alerting mode of operators/percolate: a
topic monitor or takedown watchlist should fire during the crawl
round, not in the nightly batch).

The matcher is STATELESS: the bounded query table broadcasts into
every micro-batch and each document row is tested ROW-LOCALLY with
one ``array_intersect`` per subscription — no explode, no streaming
aggregation, so the match stage scales to any executor count with
zero stream state. (The batch operator's explode + watched-term
semi-join shape wins when the subscription table grows past what a
per-row intersect should scan; at alerting-realistic sizes — up to a
few thousand standing queries — the broadcast product is the simpler
and stateless-streaming-compatible plan.)

What needs state is delivery: re-fetches re-enter the stream, and an
alert must not re-fire. ``dropDuplicatesWithinWatermark`` on
(id, query_id) bounds that state by the watermark horizon — a
re-crawl of the same page within the horizon is suppressed, one
outside it is a NEW alert by design (the subscription owner wants to
know the page still matches a week later). Checkpoint/restart resumes
the suppression set exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col


def percolate_alerts_stream(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming ``docs`` (with event-time ``ts_col``) against static
    ``queries (query_id, terms array<string>)`` -> conjunction alerts
    ``(id, query_id, ts, n_matched, n_terms)``, each (id, query_id)
    delivered once per watermark horizon."""
    q = queries.select(
        "query_id",
        F.array_distinct("terms").alias("q_terms"),
        F.size(F.array_distinct("terms")).cast("long").alias("n_terms"),
    )
    staged = docs.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        F.array_distinct(words_col(F.col(text_col))).alias("ws"),
    ).withWatermark("ts", watermark)
    matched = (
        staged.crossJoin(F.broadcast(q))
        .withColumn(
            "n_matched",
            F.size(F.array_intersect("ws", "q_terms")).cast("long"),
        )
        .filter(F.col("n_matched") >= F.col("n_terms"))
        .select("id", "query_id", "ts", "n_matched", "n_terms")
    )
    return matched.dropDuplicatesWithinWatermark(["id", "query_id"])
