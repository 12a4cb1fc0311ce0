"""TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
over the word co-occurrence graph: words that many other words
"vote for" through adjacency are a document collection's keywords,
no training data needed. The graph plane (operators/pagerank's
iterate-join-agg discipline) composed with the text plane (the
bigram construction shared with heavy_bigrams / bigram_coverage).

Semantics: nodes = corpus words; undirected edges = adjacent word
pairs (window 2), weighted by corpus co-occurrence count, self-pairs
dropped. The weighted TextRank recurrence in exact micro-units
(damping 85/100, every division a floor, so the DuckDB twin's
materialized CTE rounds land on identical scores):

    s'(i) = 150000 + sum_j (s(j) * 85 * w_ji) div (100 * W_j)

with W_j = total edge weight at j — each edge term floored
individually, matching the oracle term for term. Fixed-round
iteration (like operators/pagerank): scores start at 10^6.

Scale shape per round: one broadcast-eligible join of scores onto
edges + one destination-keyed hash agg; lineage is checkpoint-
flattened every round. Isolated words (no neighbors) never enter the
graph — they can't be keywords by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import bind_col, words_col


def cooccurrence_edges(
    df: DataFrame, text_col: str
) -> DataFrame:
    """Symmetric weighted adjacency ``(src, dst, w)`` from window-2
    co-occurrence: one explode + one hash agg; both directions
    materialized so the rank join is a plain equi-join."""
    grams = bind_col(
        words_col(F.col(text_col)),
        lambda words: F.when(
            F.size(words) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(words) - 2),
                lambda i: F.struct(
                    F.element_at(words, i + 1).alias("a"),
                    F.element_at(words, i + 2).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>")),
    )
    pairs = (
        df.select(F.explode(grams).alias("g"))
        .select(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    sym = pairs.selectExpr("a AS src", "b AS dst", "w").unionByName(
        pairs.selectExpr("b AS src", "a AS dst", "w")
    )
    return sym.groupBy("src", "dst").agg(F.sum("w").cast("long").alias("w"))


def textrank_keywords(
    df: DataFrame,
    text_col: str,
    rounds: int = 4,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` corpus keywords ``(term, score_micro)`` after
    ``rounds`` weighted TextRank iterations, ties to the smaller
    term."""
    edges = cooccurrence_edges(df, text_col)
    wout = edges.groupBy("src").agg(
        F.sum("w").cast("long").alias("w_out")
    )
    edges = edges.join(wout, "src").localCheckpoint(eager=True)
    scores = edges.select(F.col("src").alias("term")).distinct().select(
        "term", F.lit(1_000_000).cast("long").alias("s")
    )
    for _ in range(int(rounds)):
        contrib = (
            edges.join(scores, edges.src == scores.term)
            .select(
                F.col("dst").alias("term"),
                F.expr("s * 85 * w div (100 * w_out)").alias("c"),
            )
            .groupBy("term")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        # single-referenced between rounds and rounds is a small
        # constant: let all rounds ride ONE job instead of a blocking
        # checkpoint per round (edges above stays the only cut)
        scores = contrib.select(
            "term", (F.lit(150_000) + F.col("inflow")).cast("long").alias("s")
        )
    return (
        scores.select("term", F.col("s").alias("score_micro"))
        .orderBy(F.desc("score_micro"), "term")
        .limit(k)
    )


def sentence_sim_edges(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document sentence-similarity graph ``(id, si, sj, w)``.

    Nodes = sentences (marker-rule split shared with
    ``chunking.sentences_col``); edge weight between two sentences of
    the SAME document = ``common_word_types * 10^6 div (types_i +
    types_j)`` — the exact-integer surrogate of TextRank §4.1's
    ``|overlap| / (log|Si| + log|Sj|)`` normalization (monotone in
    overlap, penalizes long sentences; no float, no log).  Built from
    one (id, word-type) explode self-joined on the word key — the
    pair join is bounded per document and co-keyed on (id, word), so
    no document's sentences ever meet another document's.
    """
    from biothings_crawler_spark.operators.chunking import sentences_col

    sent = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(sentences_col(F.col(text_col)))
            .alias("si", "stext"),
        )
        .select(
            "id", "si",
            F.array_distinct(words_col(F.col("stext"))).alias("tw"),
        )
        .withColumn("nt", F.size("tw"))
        .filter(F.col("nt") > 0)
    )
    st = sent.select("id", "si", "nt", F.explode("tw").alias("w"))
    a, b = st.alias("a"), st.alias("b")
    return (
        a.join(b, ["id", "w"])
        .filter(F.col("a.si") < F.col("b.si"))
        .groupBy("id", F.col("a.si").alias("si"), F.col("b.si").alias("sj"),
                 F.col("a.nt").alias("ni"), F.col("b.nt").alias("nj"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            "id", "si", "sj",
            F.expr("c * 1000000 div (ni + nj)").alias("w"),
        )
        .filter(F.col("w") > 0)
    )


def textrank_summary(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rounds: int = 3,
    n: int = 2,
) -> DataFrame:
    """Extractive summarization (TextRank over the sentence graph):
    top-``n`` sentences per document after ``rounds`` weighted
    iterations.  Returns ``(id_col, si, score_micro, pick)`` — ``si``
    the sentence's position (so callers re-emit the summary in
    original order), ``pick`` the 1-based selection rank.

    Same per-round shape as ``textrank_keywords`` — one score join
    onto the edge table + one destination-keyed hash agg, lineage
    flattened per round — except every key carries the document id,
    so all documents iterate in the same two shuffles.  Sentences
    sharing no vocabulary with a sibling are isolated (they cannot be
    voted for — TextRank semantics) and single-sentence documents
    emit nothing.  The final top-``n`` is a per-document
    WindowGroupLimit, bounded by ``n``."""
    from pyspark.sql import Window

    half = sentence_sim_edges(docs, id_col, text_col)
    edges = half.unionByName(
        half.selectExpr("id", "sj AS si", "si AS sj", "w")
    )
    wout = edges.groupBy("id", "si").agg(
        F.sum("w").cast("long").alias("w_out"))
    edges = edges.join(wout, ["id", "si"]).localCheckpoint(eager=True)
    scores = edges.select("id", "si").distinct().withColumn(
        "s", F.lit(1_000_000).cast("long"))
    for _ in range(int(rounds)):
        contrib = (
            edges.join(scores, ["id", "si"])
            .select("id", F.col("sj").alias("si"),
                    F.expr("s * 85 * w div (100 * w_out)").alias("c"))
            .groupBy("id", "si")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        # see textrank_keywords: one job for the whole round chain
        scores = contrib.select(
            "id", "si",
            (F.lit(150_000) + F.col("inflow")).cast("long").alias("s"),
        )
    win = Window.partitionBy("id").orderBy(F.desc("s"), F.asc("si"))
    return (
        scores.withColumn("pick", F.row_number().over(win))
        .filter(F.col("pick") <= n)
        .select(F.col("id").alias(id_col), "si",
                F.col("s").alias("score_micro"),
                F.col("pick").cast("int").alias("pick"))
    )
