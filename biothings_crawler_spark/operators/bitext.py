"""Bitext pair verification by bilingual-lexicon overlap — the cheap
classic filter between URL-matched candidate pairs and an expensive
embedding aligner (cf. CCAligned's pipeline, El-Kishky et al. EMNLP
2020 §3, whose ablation keeps a dictionary-based scorer as the
LASER-free baseline; the technique itself goes back to
Resnik & Smith, "The Web as a Parallel Corpus", CL 2003 §4.2's
tsim content-based matching).

A candidate pair (src_url, tgt_url) is scored by how many of the
source document's distinct words have a dictionary translation that
actually occurs in the target document:

    overlap_ppm = |{w in src_words : lex(w) in tgt_words}| * 10^6
                  div |{w in src_words : w in lex}|

computed over DISTINCT words (type overlap, not token overlap — a
boilerplate word repeated 100 times must not dominate), and only over
lexicon-covered source words (n_lexical), so a pair is never punished
for out-of-dictionary vocabulary.  ``n_src_words`` reports the full
distinct-type count for downstream length-ratio style filters.

Exact integers end-to-end; the DuckDB twin reproduces the ppm values
bit-for-bit.

Scale shape: two explode → distinct (url, word) projections, one
broadcast join against the lexicon (bilingual dictionaries are
10^5-10^6 rows — always broadcastable), one equi-join co-keyed on
(tgt_url, word) against the target word set, then ONE per-pair hash
agg.  Documents never ride a shuffle as whole texts — only (url, word)
pairs move.  No windows, no Python, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col

PPM = 1_000_000


def _distinct_words(docs: DataFrame, url_col: str, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(url_col).alias("url"),
            F.explode(words_col(F.col(text_col))).alias("w"),
        )
        .distinct()
    )


def bitext_lexicon_score(
    pairs: DataFrame,
    src_docs: DataFrame,
    tgt_docs: DataFrame,
    lexicon: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """``(src_url, tgt_url, n_src_words, n_lexical, n_covered,
    overlap_ppm)`` for every row of ``pairs`` (columns src_url,
    tgt_url) — pairs whose source text is empty/NULL score 0 with zero
    counts rather than dropping out.

    ``lexicon`` has columns (src_word, tgt_word); multiple translations
    per source word are honored (a source word counts as covered if ANY
    of its translations occurs in the target)."""
    sw = _distinct_words(src_docs, url_col, text_col)
    tw = _distinct_words(tgt_docs, url_col, text_col)

    # src side: (pair, src word) -> lexicon translations -> probe the
    # target word set; coverage is per SOURCE word (any-translation).
    cand = (
        pairs.join(sw.withColumnRenamed("url", "src_url"), "src_url")
        .join(
            F.broadcast(lexicon.withColumnRenamed("src_word", "w")),
            "w",
            "left",
        )
    )
    translated = cand.select(
        "src_url", "tgt_url", "w", "tgt_word",
        F.col("tgt_word").isNotNull().alias("in_lex"),
    )
    probed = translated.join(
        tw.select(
            F.col("url").alias("tgt_url"),
            F.col("w").alias("tgt_word"),
            F.lit(True).alias("found"),
        ),
        ["tgt_url", "tgt_word"],
        "left",
    )
    per_word = probed.groupBy("src_url", "tgt_url", "w").agg(
        F.max("in_lex").alias("in_lex"),
        F.max(F.coalesce(F.col("found"), F.lit(False))).alias("covered"),
    )
    scored = per_word.groupBy("src_url", "tgt_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_src_words"),
        F.sum(F.col("in_lex").cast("long")).cast("long").alias("n_lexical"),
        F.sum(F.col("covered").cast("long")).cast("long").alias("n_covered"),
    )
    out = pairs.select("src_url", "tgt_url").join(
        scored, ["src_url", "tgt_url"], "left"
    )
    n_lex = F.coalesce(F.col("n_lexical"), F.lit(0))
    return out.select(
        "src_url", "tgt_url",
        F.coalesce(F.col("n_src_words"), F.lit(0)).cast("long")
        .alias("n_src_words"),
        n_lex.cast("long").alias("n_lexical"),
        F.coalesce(F.col("n_covered"), F.lit(0)).cast("long")
        .alias("n_covered"),
        F.when(n_lex > 0, F.expr(f"n_covered * {PPM} div n_lexical"))
        .otherwise(F.lit(0)).cast("long").alias("overlap_ppm"),
    )
