"""Inverted index + integer-arithmetic BM25 ranking — the batch
search surface over the crawled corpus (the reference serves ES
dis_max queries, crawler/web/handlers.py; plans/analysis.search_view
proxies that — this module adds the classic ranked-retrieval scoring
the same index would serve).

Why integer BM25: log-based idf differs between libm implementations
in the last ulp, which can flip a rank across engines. With k1=6/5 and
b=3/4 the whole BM25 term score is a RATIONAL number; clearing
denominators gives

    score(d, t) = idf_ppm(t) * 44 * tf * W  //  (20*tf*W + 6*W + 18*dl*N)
    idf_ppm(t)  = (2N - 2*df + 1) * 10^6  //  (2*df + 1)

with N = corpus size, W = total corpus words, dl = doc length — all
BIGINTs, every division a floor, so per-term scores are exact and
their sum commutes: deterministic under any partitioning and
bit-identical in DuckDB. (The idf_ppm ratio is the standard
(N - df + 0.5)/(df + 0.5) scaled by 2·10^6.)

Scale shape: the index is (term, id, tf) rows (inverted_postings) or
bounded (term, chunk_no, postings) chunks (postings_chunks) — no
unbounded per-key collect anywhere on the scale path; the full
per-term postings STRING (inverted_index) exists only as a
fixture-scale oracle projection. In bm25_topk the query-term filter
lands BEFORE the tf aggregation (only matching postings aggregate —
for a k-term query that is k postings lists, not the corpus); df/N/W
are one tiny agg broadcast as a single row; the final top-k is a
TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col


def inverted_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """THE index representation at scale: one (term, id, tf) row per
    posting. One explode + one hash agg with map-side partial combine;
    no per-term state anywhere, so a stop-word term is just many rows
    sharded across reducers — nothing accumulates in a single task."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(words_col(F.col(text_col))).alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def postings_chunks(
    postings: DataFrame, chunk_range: int = 1 << 20
) -> DataFrame:
    """Bounded posting chunks: (term, chunk_no, df_chunk, postings)
    with chunk_no = id div chunk_range. The chunk key is ROW-LOCAL (no
    window, no per-term ordering pass), so a hot stop-word term shards
    across (term, chunk_no) reducers and per-group memory is bounded by
    chunk_range documents regardless of term frequency — this is the
    serialized/query-serving form of the index at scale. chunk_no
    preserves global id order for non-negative ids, so concatenating
    chunk strings in chunk_no order reproduces the canonical full
    postings list."""
    return (
        postings.groupBy("term", F.expr(f"id div {int(chunk_range)}").alias("chunk_no"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_chunk"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("id", "tf"))),
                    lambda s: F.concat_ws(":", s["id"].cast("string"), s["tf"].cast("string")),
                ),
                " ",
            ).alias("postings"),
        )
    )


def inverted_index(
    df: DataFrame, id_col: str, text_col: str, chunk_range: int = 1 << 20
) -> DataFrame:
    """Canonical (term, df, postings) with postings = 'id:tf id:tf ...'
    in id order — an ORACLE-ONLY projection for fixture-scale
    cross-engine comparison (array columns don't hash portably). The
    final per-term string re-assembly from chunks is the one unbounded
    per-key step and is deliberately NOT the scale path: at scale the
    index IS inverted_postings / postings_chunks; nothing downstream
    (bm25_topk included) consumes this string."""
    chunks = postings_chunks(inverted_postings(df, id_col, text_col), chunk_range)
    return chunks.groupBy("term").agg(
        F.sum("df_chunk").cast("long").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_no", "postings"))),
                lambda s: s["postings"],
            ),
            " ",
        ).alias("postings"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under integer BM25
    (k1=1.2, b=0.75 — the rational constants cleared above). Returns
    (id, score) with score in exact integer units, ties broken by id."""
    docs = df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("words"))
    lens = docs.select("id", F.size("words").cast("long").alias("dl"))
    totals = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("w_total"),
    )

    terms = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        docs.select("id", F.explode("words").alias("term"))
        .filter(F.array_contains(terms, F.col("term")))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "id")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.expr(
                "((2 * n_docs - 2 * df + 1) * 1000000 div (2 * df + 1))"
                " * 44 * tf * w_total"
                " div (20 * tf * w_total + 6 * w_total + 18 * dl * n_docs)"
            ).alias("term_score"),
        )
        .groupBy("id")
        .agg(F.sum("term_score").cast("long").alias("score"))
    )
    return scored.orderBy(F.desc("score"), "id").limit(k)
