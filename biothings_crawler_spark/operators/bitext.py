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


def margin_mining(
    candidates: DataFrame,
    k: int = 4,
    margin_threshold_ppm: int = 1_300_000,
) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
    the LASER/CCMatrix criterion): a candidate pair survives only if
    its similarity stands out RELATIVELY to each side's neighborhood —
    absolute cosine thresholds fail because hubness inflates whole
    regions of embedding space.

    ``candidates``: (src_id, tgt_id, cos_ppm) — any candidate
    generator: brute force at oracle scale, the IVF/PQ probe plane at
    10^10 (the operator is deliberately candidate-agnostic so the ANN
    index does the heavy lifting in production).

    ratio margin, integer-exact with per-side neighbor counts m ≤ k:

        margin_ppm = cos · 2·m_src·m_tgt · 10⁶
                     div (sum_src·m_tgt + sum_tgt·m_src)

    where sum_side is the side's top-m cosine sum (the pair itself
    included, per the reference implementation). Non-positive-cosine
    candidates are dropped first — they cannot be translations, and
    keeping every sum strictly positive makes truncating and flooring
    division agree, so the DuckDB twin is exact.

    Mutual-best filter: forward argmax over tgt for each src AND
    backward argmax over src for each tgt must agree (the
    'max' strategy), then the margin threshold gates mining.

    Shape: two windows over the candidate lists (each bounded by the
    generator's per-probe candidate count, not the corpus), two
    cell-sized hash aggs, one co-keyed join. Output: one row per
    mutual-best pair — (src_id, tgt_id, cos_ppm, margin_ppm, mined).
    """
    from pyspark.sql import Window as W

    c = candidates.filter(F.col("cos_ppm") > 0)

    def topk_side(key: str) -> DataFrame:
        w = W.partitionBy(key).orderBy(
            F.desc("cos_ppm"), "src_id", "tgt_id")
        r = c.withColumn("rn", F.row_number().over(w))
        return r.filter(F.col("rn") <= k).groupBy(key).agg(
            F.sum("cos_ppm").cast("long").alias(f"sum_{key}"),
            F.count(F.lit(1)).cast("long").alias(f"m_{key}"),
        ), r.filter(F.col("rn") == 1).select(
            "src_id", "tgt_id")

    src_stats, fwd_best = topk_side("src_id")
    tgt_stats, bwd_best = topk_side("tgt_id")
    mutual = fwd_best.join(bwd_best, ["src_id", "tgt_id"])
    out = (
        c.join(mutual, ["src_id", "tgt_id"])
        .join(src_stats, "src_id")
        .join(tgt_stats, "tgt_id")
    )
    margin = F.expr(
        "cos_ppm * 2 * m_src_id * m_tgt_id * 1000000"
        " div (sum_src_id * m_tgt_id + sum_tgt_id * m_src_id)"
    )
    return out.select(
        "src_id", "tgt_id", "cos_ppm",
        margin.cast("long").alias("margin_ppm"),
        (margin >= F.lit(margin_threshold_ppm)).cast("long").alias("mined"),
    )
