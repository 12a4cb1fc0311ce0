"""Byte-pair-encoding merge training over the corpus — the tokenizer
HALF of an LLM data pipeline (the engine already counts tokens; this
learns the vocabulary those counts assume).

Classic BPE (Sennrich, Haddow & Birch, "Neural machine translation of
rare words with subword units", ACL 2016): start from characters plus
an end-of-word marker, repeatedly count adjacent symbol pairs weighted
by word frequency, and merge the most frequent pair corpus-wide.  The
reference has nothing of the kind; at 100 TB the interesting part is
the SHAPE: each round is ONE hash aggregate over (pair, weight) — the
word table is tiny relative to the corpus because training runs on
distinct words with counts, the standard trick — plus a row-local
merge application, so a round costs one shuffle regardless of corpus
size, and the driver pulls back exactly ONE row per round (the argmax
pair), never the data.

Merge application is a string fold (out, prev) over the symbol
sequence — greedy left-to-right, the BPE contract ('x x x x' with
pair (x,x) -> 'xx xx', never the overlapping middle pair).  State is
strings only and the fold is padded to a fixed length, which keeps the
DuckDB twin clear of both v1.0.0 list_reduce pitfalls (list-state loss
and varying-length corruption).  Ties break deterministically by
(count DESC, left ASC, right ASC) on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

END_MARK = "$"


def chars_with_marker_col(w: Column) -> Column:
    """'abc' -> 'a b c $' (space-joined symbols + end-of-word marker)."""
    return F.concat(
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.length(w)),
                        lambda i: F.substring(w, i, 1)), " "),
        F.lit(" " + END_MARK))


def apply_merge_col(seq: Column, left: Column, right: Column,
                    max_tokens: int = 14) -> Column:
    """One greedy left-to-right merge pass of the pair (left, right)
    over a space-joined symbol sequence: bounded string-state fold."""
    toks = F.split(seq, " ")

    def step(acc: Column, i: Column) -> Column:
        live = i <= F.size(toks)
        t = F.element_at(toks, i)
        merging = (acc["prev"] == left) & (t == right)
        return F.struct(
            F.when(~live | merging | (acc["prev"] == ""), acc["out"])
             .otherwise(F.concat_ws(" ", F.nullif(acc["out"], F.lit("")),
                                    acc["prev"])).alias("out"),
            F.when(~live, acc["prev"])
             .when(merging, F.concat(left, right))
             .otherwise(t).alias("prev"),
        )

    def finish(acc: Column) -> Column:
        return F.concat_ws(
            " ", F.nullif(acc["out"], F.lit("")),
            F.nullif(acc["prev"], F.lit("")))

    init = F.struct(F.lit("").alias("out"), F.lit("").alias("prev"))
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(int(max_tokens))), init, step, finish)


def word_counts(docs: DataFrame, text_col: str,
                max_word_len: int = 12) -> DataFrame:
    """(w, weight) — distinct lowercase alpha words with frequencies;
    the compressed training input (corpus size falls out of the cost
    after this one aggregate)."""
    return (docs
            .select(F.explode(F.split(F.lower(F.col(text_col)),
                                      r"[^a-z]+")).alias("w"))
            .filter((F.length("w") > 0)
                    & (F.length("w") <= max_word_len))
            .groupBy("w").agg(F.count("*").cast("long").alias("weight")))


def bpe_train(
    spark: SparkSession,
    words: DataFrame,
    n_merges: int = 6,
    max_tokens: int = 14,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (w, weight) table.

    Returns (merge table [(rank, left, right, cnt)], final segmented
    words DataFrame (w, weight, seq)).  Per round: one adjacent-pair
    hash aggregate, one single-row argmax collect, one row-local merge
    projection, plan cut via localCheckpoint (the pagerank-style
    bounded iteration idiom).
    """
    state = words.select(
        "w", "weight",
        chars_with_marker_col(F.col("w")).alias("seq"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        toks = F.split("seq", " ")
        pairs = (state
                 .select("weight",
                         F.explode(F.transform(
                             F.sequence(F.lit(1), F.size(toks) - 1),
                             lambda i: F.struct(
                                 F.element_at(toks, i).alias("a"),
                                 F.element_at(toks, i + 1).alias("b"))))
                          .alias("p"))
                 .groupBy(F.col("p")["a"].alias("a"),
                          F.col("p")["b"].alias("b"))
                 .agg(F.sum("weight").cast("long").alias("cnt")))
        best = pairs.orderBy(F.desc("cnt"), "a", "b").first()
        if best is None:
            break
        merges.append((k, best["a"], best["b"], int(best["cnt"])))
        state = state.withColumn(
            "seq", apply_merge_col(
                F.col("seq"), F.lit(best["a"]), F.lit(best["b"]),
                max_tokens=max_tokens),
        ).localCheckpoint(eager=True)
    return merges, state
