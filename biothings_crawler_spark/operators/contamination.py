"""Benchmark decontamination: flag training documents whose word
n-grams overlap a held-out benchmark/test set (GPT-3 appendix C /
PaLM-style 13-gram decontamination; n is a parameter — the driver
pair runs n=5 against the small synthetic corpus).

Scale shape: the benchmark side is *inherently bounded* (test sets
are millions of n-grams, not billions), so it is legitimately
broadcast — this is the one place in the pipeline where a hard
``F.broadcast`` hint is correct by construction, unlike the
boilerplate-line set (see operators/text.line_dedup's no-hint note).
The corpus side explodes each document's DISTINCT n-grams and
hash-joins them against the broadcast set map-side — no shuffle of
the gram stream — then one partial-agg'd groupBy(id) over only the
*hits* (a tiny fraction of the corpus).

Honest cost accounting at 10^10 documents: the n-gram construction
runs twice per document (once for the hit stream, once for the
per-doc gram count) — both embarrassingly parallel scan passes —
and the final totals⋈hits join keys 1-row-per-doc totals against the
near-empty hits side (AQE broadcasts it in practice; without AQE it
is one well-keyed exchange of (id, n_grams) pairs, not of text).
The alternative single-pass shape (explode_outer + groupBy(id) over
ALL grams) trades the second scan for shuffling the entire gram
stream — strictly worse at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col


def word_ngrams_col(text: Column, n: int) -> Column:
    """Distinct lowercase word n-grams (space-joined); documents with
    fewer than n words contribute none. The word split is let-bound
    (text.bind_col) so it evaluates once per row, not per gram index."""
    from biothings_crawler_spark.operators.text import bind_col

    return bind_col(
        words_col(text),
        lambda w: F.array_distinct(
            F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(w, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document benchmark-overlap report: (id, n_grams, n_hits,
    contaminated). ``n_hits`` counts the document's distinct n-grams
    that appear anywhere in the benchmark set; ``contaminated`` is
    ``n_hits >= min_hits``."""
    bench_grams = (
        bench.select(F.explode(word_ngrams_col(F.col(bench_text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    totals = docs.select(
        F.col(id_col).alias("id"),
        F.size(word_ngrams_col(F.col(text_col), n)).cast("long").alias("n_grams"),
    )
    return totals.join(hits, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
    )
