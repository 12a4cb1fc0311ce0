"""Pseudo-relevance-feedback query expansion (Rocchio 1971's blind
feedback loop, with tf-idf expansion-term selection as in the classic
textbook treatment — public literature), composed entirely from the
existing integer-BM25 plane.

Two-pass retrieval, all declarative — the expansion terms NEVER visit
the driver:

1. first pass: integer BM25 top-``fb_docs`` for the literal query
   (the pseudo-relevant set — a TakeOrdered, <= fb_docs rows);
2. expansion selection: candidate terms from the feedback docs scored
   ``score_ppm = tf_fb * 10^6 div (df_corpus + 1)`` — frequent in the
   feedback set, rare in the corpus — original query terms excluded,
   top-``n_exp`` by (score desc, term);
3. second pass: BM25 again over (original UNION expansion) terms via
   :func:`bm25_scores_terms_df`, whose term set is a broadcast-joined
   DataFrame, so the whole two-pass pipeline is ONE Spark plan.

Scale shape: pass 1 is the standard BM25 plan; the feedback set is
<= fb_docs rows (broadcast semi-join); candidate scoring is one hash
agg over the feedback docs' tokens joined to the corpus df-table; the
expansion set is <= n_exp rows (broadcast).  Nothing driver-side,
nothing all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.bm25 import (
    bm25_scores_terms_df,
    bm25_topk,
)
from biothings_crawler_spark.operators.text import words_col


def prf_expand_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    fb_docs: int = 10,
    n_exp: int = 5,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Top-``n_exp`` expansion terms: (term, tf_fb, df_corpus,
    score_ppm), ties broken by term.  ``docs`` optionally supplies the
    pre-tokenized ``(id, words)`` corpus shared with the retrieval
    passes (prf_search materializes it once — tokenization is the
    dominant repeated cost of the two-pass plan)."""
    fb = bm25_topk(
        df, id_col, text_col, query_terms, k=fb_docs, docs=docs
    ).select("id")
    if docs is None:
        docs = df.select(
            F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("words"))
    words = docs.select("id", F.explode("words").alias("term"))
    df_corpus = (
        words.distinct()
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_corpus"))
    )
    tf_fb = (
        words.join(F.broadcast(fb), "id")
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("tf_fb"))
        .filter(~F.col("term").isin(query_terms))
    )
    return (
        tf_fb.join(df_corpus, "term")
        .select(
            "term", "tf_fb", "df_corpus",
            F.expr("tf_fb * 1000000L div (df_corpus + 1)").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), "term")
        .limit(n_exp)
    )


def prf_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    fb_docs: int = 10,
    n_exp: int = 5,
    k: int = 20,
) -> DataFrame:
    """Two-pass PRF retrieval: final top-``k`` (id, score) under the
    expanded term set, ties broken by id.

    The tokenized corpus is materialized ONCE (eager localCheckpoint)
    and shared by all four consumers — pass-1 BM25, the corpus df
    table, the feedback tf table, and pass-2 BM25 — which otherwise
    each re-run the words_col regex tokenization over the full corpus
    (four passes measured at sf0.1).  At 10^10 rows this is the token
    table a serving index materializes anyway."""
    toks = df.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("words")
    ).localCheckpoint(eager=True)
    exp = prf_expand_terms(
        df, id_col, text_col, query_terms, fb_docs, n_exp, docs=toks
    ).select("term")
    spark = df.sparkSession
    orig = spark.createDataFrame([(t,) for t in query_terms], "term string")
    terms = orig.union(exp).distinct()
    return (
        bm25_scores_terms_df(df, id_col, text_col, terms, docs=toks)
        .orderBy(F.desc("score"), "id")
        .limit(k)
    )
