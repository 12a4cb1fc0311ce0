"""Multinomial Naive Bayes over hashed word features — the quality /
topic / language classifier stage of a web-text training-data pipeline
(the fastText-classifier role in DCLM / RefinedWeb / GPT-3-style
curation: train a cheap linear model on a trusted seed, score every
crawled page, keep the confident slice).

The reference crawler has no classifier stage (its corpus is curated
API metadata, crawler/spiders/*); at Common-Crawl scale a hashed
linear classifier is the standard first quality gate.  Real pipelines
use fastText binaries; the cross-engine-exact stand-in here is
multinomial NB with **exact fixed-point base-2 log probabilities**, so
the DuckDB oracle replays training and scoring bit-for-bit (the same
determinism contract as operators/lm.py's integer bigram LM — and NB
over hashed bag-of-words IS a linear model: score(label) = prior +
Σ_b tf_b · w_{label,b}).

Determinism: log p is transcendental, so probabilities are scored in
**lg-fxp units** — floor(65536 · log2(x)) computed EXACTLY by integer
arithmetic: n = floor(log2 x) from the binary-string length, then 16
fractional bits from the classic squaring recurrence (normalize the
mantissa m to [2^16, 2^17); square; a doubled bit is 1 iff m² crosses
2^17; 16 iterations as one expression-level fold).  Both engines run
the identical integer recurrence — no libm, no ulp drift.  The fold
runs on MODEL rows only (≤ labels × n_buckets), never per document.

Feature hashing (Weinberger et al. 2009) bounds the model: bucket =
md5-u32(word) mod n_buckets, so the model is a fixed-size broadcast
table no matter how large the vocabulary grows — the 100-TB shape is
explode → ONE (id, bucket) hash agg → broadcast model join → ONE
per-(id,label) hash agg → min-struct argmax.  No windows, no Python,
no floats, no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import words_col

FXP = 65536  # 2^16 fixed-point scale for log2

# One squaring step of the fractional-log2 recurrence over the packed
# accumulator acc = y * 2^18 + m  (m in [2^16, 2^17), y = bits so far).
# {D} is the engine's integer floor-division operator.
_STEP = (
    "CASE WHEN ((acc % 262144) * (acc % 262144)) {D} 65536 >= 131072 "
    "THEN ((acc {D} 262144) * 2 + 1) * 262144 "
    "+ (((acc % 262144) * (acc % 262144)) {D} 65536) {D} 2 "
    "ELSE ((acc {D} 262144) * 2) * 262144 "
    "+ ((acc % 262144) * (acc % 262144)) {D} 65536 END"
)


def ilog2_fxp_spark(x: str) -> str:
    """Spark SQL expression: floor(65536 * log2(x)) exactly, x >= 1
    integer (x <= 2^46 so the mantissa scale never overflows)."""
    n = f"(length(bin({x})) - 1)"
    m0 = f"((({x}) * 65536L) div shiftleft(1L, cast({n} as int)))"
    step = _STEP.format(D="div")
    fold = f"aggregate(sequence(1, 16), {m0}, (acc, i) -> {step})"
    return f"(({n}) * 65536 + ({fold}) div 262144)"


def ilog2_fxp_duck(x: str) -> str:
    """DuckDB twin of :func:`ilog2_fxp_spark` — identical recurrence,
    list_reduce with a packed scalar accumulator (the struct-fold
    storage-aliasing hazard documented on the Hilbert oracle)."""
    n = f"(length(bin({x})) - 1)"
    m0 = f"((({x})::BIGINT * 65536) // (1::BIGINT << ({n})))"
    step = _STEP.format(D="//")
    lst = ", ".join(str(i) for i in range(1, 17))
    fold = f"list_reduce(list_prepend({m0}, [{lst}]), (acc, e) -> {step})"
    return f"(({n}) * 65536 + ({fold}) // 262144)"


def hashed_features(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = 512
) -> DataFrame:
    """(id, bucket, tf) — hashed bag-of-words term frequencies.

    bucket = md5-u32(word) mod n_buckets (the cross-engine hash used
    by every banding operator in this engine); tf = occurrences.  One
    explode + ONE hash agg; output rows per doc are bounded by
    min(doc words, n_buckets)."""
    w = df.select(
        F.col(id_col).alias("id"),
        F.explode(words_col(F.col(text_col))).alias("w"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return (
        w.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def nb_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 512,
) -> DataFrame:
    """Train multinomial NB; returns the DENSE model table
    ``(label, bucket, w_fxp)`` — one row per (label, bucket) including
    unseen buckets (Laplace +1), plus one ``bucket = -1`` row per label
    carrying the document prior:

    * ``w_fxp(label, b) = lg(cnt_{label,b} + 1) - lg(tot_label + V)``
    * ``prior_fxp(label) = lg(docs_label) - lg(docs_total)``

    (lg = the exact fixed-point log2 above, V = n_buckets).  Dense
    materialization keeps scoring a plain equi-join with no per-label
    default fallback; the model is labels × (V+1) rows — bounded by
    construction, broadcastable at any corpus size.
    """
    feats = hashed_features(df, id_col, text_col, n_buckets)
    labs = df.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label")
    )
    cnt = (
        feats.join(labs, "id")
        .groupBy("label", "bucket")
        .agg(F.sum("tf").cast("long").alias("cnt"))
    )
    # dense (label, bucket) grid: every label gets all V buckets
    grid = (
        labs.select("label").distinct()
        .select("label",
                F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
                .alias("_b"))
        .select("label", F.col("_b").cast("long").alias("bucket"))
    )
    dense = grid.join(cnt, ["label", "bucket"], "left").select(
        "label", "bucket", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    tot = dense.groupBy("label").agg(F.sum("cnt").cast("long").alias("tot"))
    cond = (
        dense.join(F.broadcast(tot), "label")
        .select(
            "label",
            "bucket",
            (
                F.expr(ilog2_fxp_spark("cnt + 1"))
                - F.expr(ilog2_fxp_spark(f"tot + {n_buckets}"))
            ).cast("long").alias("w_fxp"),
        )
    )
    docs = labs.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("nd")
    )
    ndt = docs.agg(F.sum("nd").cast("long").alias("ndt"))
    prior = (
        docs.crossJoin(F.broadcast(ndt))
        .select(
            "label",
            F.lit(-1).cast("long").alias("bucket"),
            (
                F.expr(ilog2_fxp_spark("nd"))
                - F.expr(ilog2_fxp_spark("ndt"))
            ).cast("long").alias("w_fxp"),
        )
    )
    return cond.unionByName(prior)


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
) -> DataFrame:
    """Score documents against a trained model; returns
    ``(id, pred, score_fxp)`` — argmax_label prior + Σ tf · w, ties
    broken by smaller label (min-struct argmax, no window).

    The model join is label-dense, so a document's features join every
    label exactly once per bucket — the doc-side stream is
    |doc buckets| × |labels| rows, model side broadcast."""
    feats = hashed_features(df, id_col, text_col, n_buckets)
    cond = model.filter(F.col("bucket") >= 0)
    prior = model.filter(F.col("bucket") == -1).select(
        "label", F.col("w_fxp").alias("prior_fxp")
    )
    per_label = (
        feats.join(F.broadcast(cond), "bucket")
        .groupBy("id", "label")
        .agg(F.sum(F.col("tf") * F.col("w_fxp")).cast("long").alias("s"))
        .join(F.broadcast(prior), "label")
        .select(
            "id", "label",
            (F.col("s") + F.col("prior_fxp")).alias("score_fxp"),
        )
    )
    # docs with no tokens score prior-only: union a zero row per label.
    # NULL text counts as empty (size(NULL) is -1 non-ANSI / NULL ANSI,
    # never 0 — a bare == 0 silently dropped NULL-text docs while the
    # SQL oracle's NOT-IN branch kept them).
    empty = (
        df.select(F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("ws"))
        .filter(F.coalesce(F.size("ws"), F.lit(0)) <= 0)
        .crossJoin(F.broadcast(prior))
        .select("id", "label", F.col("prior_fxp").alias("score_fxp"))
    )
    allrows = per_label.unionByName(empty)
    best = (
        allrows.groupBy("id")
        .agg(F.min(F.struct((-F.col("score_fxp")).alias("ns"),
                            F.col("label").alias("l"))).alias("b"))
    )
    return best.select(
        "id",
        F.col("b.l").alias("pred"),
        (-F.col("b.ns")).cast("long").alias("score_fxp"),
    )


def active_select(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 512,
    k: int = 10,
) -> DataFrame:
    """Uncertainty sampling for the labeling loop (Lewis & Gale 1994):
    rank unlabeled documents by the classifier's top-two MARGIN —
    smallest first — within each predicted class, and surface the k
    most ambiguous per class for human annotation. The data-centric
    complement of nb_classify: the classifier's least-confident
    decisions are where the next labeling dollar buys the most
    accuracy (and where cohen_kappa then audits the annotators).

    Exactness: scores are the nb fixed-point integers; the top-2 per
    document comes from sorting the per-id score list, which is
    BOUNDED by |labels| (a collect over label count, never corpus
    size), so margin = best − second is a plain integer. Selection is
    a per-predicted-class window over the candidate census.

    Output: (pred, id, margin_fxp, rank), rank <= k, most ambiguous
    first (ties by id).
    """
    from pyspark.sql import Window as W

    feats = hashed_features(df, id_col, text_col, n_buckets)
    cond = model.filter(F.col("bucket") >= 0)
    prior = model.filter(F.col("bucket") == -1).select(
        "label", F.col("w_fxp").alias("prior_fxp"))
    per_label = (
        feats.join(F.broadcast(cond), "bucket")
        .groupBy("id", "label")
        .agg(F.sum(F.col("tf") * F.col("w_fxp")).cast("long").alias("s"))
        .join(F.broadcast(prior), "label")
        .select("id", "label",
                (F.col("s") + F.col("prior_fxp")).alias("score_fxp"))
    )
    empty = (
        df.select(F.col(id_col).alias("id"),
                  words_col(F.col(text_col)).alias("ws"))
        .filter(F.coalesce(F.size("ws"), F.lit(0)) <= 0)
        .crossJoin(F.broadcast(prior))
        .select("id", "label", F.col("prior_fxp").alias("score_fxp"))
    )
    allrows = per_label.unionByName(empty)
    top2 = allrows.groupBy("id").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct(
                (-F.col("score_fxp")).alias("ns"),
                F.col("label").alias("l")))),
            1, 2,
        ).alias("t2"))
    margins = top2.select(
        "id",
        F.col("t2")[0].getField("l").alias("pred"),
        F.when(
            F.size("t2") > 1,
            F.col("t2")[1].getField("ns") - F.col("t2")[0].getField("ns"),
        ).otherwise(F.lit(None)).cast("long").alias("margin_fxp"),
    ).filter(F.col("margin_fxp").isNotNull())
    w = W.partitionBy("pred").orderBy("margin_fxp", "id")
    return margins.select(
        "pred", "id", "margin_fxp",
        F.row_number().over(w).cast("long").alias("rank"),
    ).filter(F.col("rank") <= k)
