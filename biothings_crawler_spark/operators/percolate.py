"""Prospective search (percolation) — the reverse of retrieval: a
bounded table of STANDING queries (alert subscriptions, topic
monitors, takedown watchlists) is matched against every incoming
document, so each crawl round announces "which subscriptions does
this new page satisfy" instead of waiting for someone to ask.  The
reference crawler routes pages to per-source parsers by URL rule;
prospective matching is the content-side generalization a 100-TB
pipeline needs for alerting and routing.

Semantics: a query is a CONJUNCTION of terms; a document matches when
every term occurs in it (the Elasticsearch percolator's base case).
``min_should`` relaxes it to an m-of-n disjunction (m = n applies the
pure conjunction).

Scale shape: the query table is bounded by construction (thousands of
subscriptions vs billions of docs), so it broadcasts twice — once as
the distinct-term filter that prunes the exploded doc-term stream to
terms ANY query mentions (the stream shrinks from corpus-token-sized
to watched-term-sized before the only shuffle), and once as the
(term, query) join. One (id, query) hash agg closes the match. No
windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col


def prospective_match(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    min_should: int | None = None,
) -> DataFrame:
    """``docs`` with ``queries (query_id, terms array<string>)`` ->
    ``(id, query_id, n_matched, n_terms)`` for every satisfied
    subscription: ``n_matched`` distinct query terms present,
    satisfied when ``n_matched >= min(min_should or n_terms,
    n_terms)``.  Duplicate terms inside a query count once."""
    q_terms = queries.select(
        "query_id",
        F.explode(F.array_distinct("terms")).alias("term"),
    )
    q_sizes = q_terms.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    watched = q_terms.select("term").distinct()
    doc_terms = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(words_col(F.col(text_col))))
        .alias("term"),
    ).join(F.broadcast(watched), "term", "left_semi")
    matched = (
        doc_terms.join(F.broadcast(q_terms), "term")
        .groupBy("id", "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
        .join(F.broadcast(q_sizes), "query_id")
    )
    need = (
        F.least(F.lit(int(min_should)).cast("long"), F.col("n_terms"))
        if min_should is not None
        else F.col("n_terms")
    )
    return matched.filter(F.col("n_matched") >= need).select(
        "id", "query_id", "n_matched", "n_terms"
    )
