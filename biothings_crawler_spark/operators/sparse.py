"""Sparse term-space all-pairs similarity through the inverted index
(Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity Search") —
the term-vector complement to the embedding planes in similarity.py /
dedup.py: TF-IDF cosine between documents computed by joining posting
lists, never by materializing vectors or crossing the corpus.

Why document-frequency pruning is the scale lever: a term of document
frequency df contributes df·(df-1)/2 candidate pairs, so one stop word
at df = 10^8 alone is 5·10^15 pairs.  Dropping terms with df > df_max
bounds candidate generation by Σ_rare df² while barely moving the
metric — high-df terms carry near-zero idf weight anyway.  The pruned
space is DECLARED (cosine over the df ≤ df_max vocabulary), so the
result is exact in that space, not an approximation of something else.

Why integer arithmetic: idf weights are milli-scaled floor ratios
(same family as bm25.py's idf_ppm) and the final score is squared
cosine in ppm — dot² · 10⁶ div (‖a‖²·‖b‖²) — computed in DECIMAL(38,0)
(HUGEINT on the DuckDB side), so ranking is bit-identical across
engines and partitionings.  cos² is monotone in cos for non-negative
weights, so top-k order is the top-k cosine order.

The milli idf scale bounds per-posting weights so ‖·‖² stays in a
BIGINT for corpora to ~10^9 docs per index shard; shard the index (or
drop the scale) beyond that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col

IDF_SCALE = 1000


def bigrams_col(words: Column) -> Column:
    """Adjacent word bigrams 'w1 w2' — empty for docs under two words
    (guarded: sequence(1, 0) would be DESCENDING in Spark)."""
    n = F.size(words)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def tfidf_neighbors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    df_max: int = 20,
    k: int = 50,
) -> DataFrame:
    """Top-k most-similar document pairs by TF-IDF cosine over the
    bigram vocabulary pruned to document frequency ≤ ``df_max``:
    ``(id1, id2, cos2_ppm)`` with id1 < id2, squared cosine in exact
    ppm, ties broken by (id1, id2).

    Plan shape: explode → (term, id) hash agg → broadcast df filter →
    posting-list self-join keyed on term (candidate volume Σ_rare df²
    by construction) → (id1, id2) partial-agg dot products → two narrow
    norm joins → TakeOrderedAndProject.  No crossJoin, no vectors ever
    shuffle — only (term, id, weight) rows.
    """
    # words staged as a leaf attribute: lambda bodies in bigrams_col
    # must reference a column, not an inlined split/filter subtree
    # (re-evaluated per element otherwise)
    docs = df.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("words")
    ).select("id", bigrams_col(F.col("words")).alias("terms"))
    postings = (
        docs.select("id", F.explode("terms").alias("term"))
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("dfc"))
    rare = dfreq.filter(F.col("dfc") <= df_max)
    totals = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    weighted = (
        postings.join(F.broadcast(rare), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "term", "id",
            F.expr(
                f"tf * ((2 * n_docs - 2 * dfc + 1) * {IDF_SCALE}"
                " div (2 * dfc + 1))"
            ).cast("long").alias("wgt"),
        )
        # consumed three times (norms + both sides of the candidate
        # join): checkpoint so the explode→agg index builds ONCE
        .localCheckpoint(eager=True)
    )
    norms = weighted.groupBy("id").agg(
        F.sum(F.col("wgt") * F.col("wgt")).cast("long").alias("nrm")
    )
    a, b = weighted.alias("a"), weighted.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.sum(F.col("a.wgt") * F.col("b.wgt")).cast("long").alias("dot"))
    )
    n1 = norms.select(F.col("id").alias("id1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("id").alias("id2"), F.col("nrm").alias("nrm2"))
    return (
        dots.join(n1, "id1")
        .join(n2, "id2")
        .select(
            "id1", "id2",
            F.expr(
                "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 1000000"
                " div (CAST(nrm1 AS DECIMAL(38,0)) * nrm2) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
        .orderBy(F.desc("cos2_ppm"), "id1", "id2")
        .limit(k)
    )
