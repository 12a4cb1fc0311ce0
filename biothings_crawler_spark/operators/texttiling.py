"""TextTiling topic segmentation (Hearst, CL 1997) — exact integers.

Splits each document at topic shifts: lexical-cohesion scores across
the gaps between fixed-width pseudo-sentences, depth scoring at the
local minima, boundaries where the depth clears the corpus-classic
``mean - stddev/2`` cutoff.  The semantic sibling of
``operators/chunking.rag_chunks`` (token-budget splitter): tiling
boundaries are where a retrieval chunker SHOULD cut when it can
afford to.

Exact-integer surrogates (house rule — the oracle must be
bit-identical):

* Block cohesion uses SQUARED cosine in ppm —
  ``dot² · 10⁶ div (‖L‖²·‖R‖²)`` — monotone in cosine for
  non-negative count vectors, so peaks/valleys (all TextTiling looks
  at) land in the same places, with no square root.  Bound: with
  block size ``K·W`` tokens, ``dot ≤ (K·W)²`` and the numerator is
  ``≤ (K·W)⁴·10⁶`` — int64-safe through ``K·W ≤ 1300``; the defaults
  (K=2, W=10) leave 10 orders of headroom.
* The Hearst cutoff ``depth > μ − σ/2`` is evaluated without sqrt:
  with ``n`` gaps, ``Σd``, ``Σd²``, boundary ⇔
  ``2·Σd − 2·n·d < 0`` (depth strictly above the mean) or
  ``n·Σd² − (Σd)² > (2·Σd − 2·n·d)²`` (squared both sides of
  ``n·σ > 2·n·(μ − d)``).  The squared comparison is int64-exact
  through ~1500 gaps per document (15k tokens at W=10) — re-scale
  ``w`` upward for longer documents.

Scale shape: three hash aggregates with map-side partials (token
counts per pseudo-sentence; per-gap-side counts after a bounded ≤2K
gap-membership fan-out; per-gap dot/norms), then ONE bounded
``collect_list`` per document (≤ gaps-per-doc structs) feeding a
row-local depth/threshold fold.  No windows, no self-joins, nothing
all-pairs; the only shuffles are the keyed aggs, so skew is bounded
by the largest single document, not by any corpus property.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.text import bind_col, words_col

# Hearst depth per gap: climb to the nearest left/right peaks of the
# score sequence.  try_element_at keeps the edge probes ANSI-safe
# (t=0 / t=m-1 are caught by the OR's short-circuit, but the guard
# keeps the expression valid under any evaluation order).
_DEPTHS_EXPR = """
  transform(sequence(0, size(sc) - 1), j ->
    element_at(sc, array_max(filter(sequence(0, j),
      t -> t = 0 OR try_element_at(sc, t) < try_element_at(sc, t + 1))) + 1)
    + element_at(sc, array_min(filter(sequence(j, size(sc) - 1),
      t -> t = size(sc) - 1
           OR try_element_at(sc, t + 2) < try_element_at(sc, t + 1))) + 1)
    - 2 * element_at(sc, j + 1))
"""


def _gap_scores(
    docs: DataFrame, id_col: str, text_col: str, w: int, k: int
) -> DataFrame:
    """Shared pipeline head: per-document sorted gap/score array
    ``(id_col, ntok, gs, sc)`` — three hash aggs, bounded collect."""
    gid = F.col(id_col)

    # (id, ntok, P, p, token): pseudo-sentence index per token
    toks = (
        docs.select(
            gid,
            words_col(F.col(text_col)).alias("ws"),
        )
        .withColumn("ntok", F.size("ws"))
        .filter(F.col("ntok") > w)  # need >= 2 pseudo-sentences
        .select(
            gid,
            "ntok",
            F.expr(f"CAST((ntok + {w} - 1) div {w} AS INT)").alias("pp"),
            F.posexplode("ws").alias("pos", "tok"),
        )
        .select(gid, "ntok", "pp",
                F.expr(f"CAST(pos div {w} AS INT)").alias("p"), "tok")
    )
    # token counts per pseudo-sentence — agg 1 (ntok/pp are constant
    # per id: free-riding group keys, no extra cardinality)
    cnt = toks.groupBy(id_col, "ntok", "pp", "p", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    # gap membership (bounded fan-out <= 2k per pseudo-sentence):
    # left block of gap i is p in [i-k, i-1]  ->  i in [p+1, p+k]
    # right block of gap i is p in [i, i+k-1] ->  i in [p-k+1, p]
    sides = cnt.select(
        gid, "ntok", "pp", "tok", "c",
        F.explode(
            F.concat(
                F.transform(
                    F.sequence(F.col("p") + 1, F.col("p") + k),
                    lambda i: F.struct(
                        i.alias("gap"), F.lit("l").alias("side")),
                ),
                F.transform(
                    F.sequence(F.col("p") - k + 1, F.col("p")),
                    lambda i: F.struct(
                        i.alias("gap"), F.lit("r").alias("side")),
                ),
            )
        ).alias("m"),
    ).select(
        gid, "ntok", "tok", "c",
        F.col("m.gap").alias("gap"), F.col("m.side").alias("side"),
    ).filter((F.col("gap") >= 1) & (F.col("gap") <= F.col("pp") - 1))
    # per (id, gap, token): left/right counts — agg 2
    per_tok = sides.groupBy(id_col, "ntok", "gap", "tok").agg(
        F.sum(F.when(F.col("side") == "l", F.col("c")).otherwise(0))
        .alias("cl"),
        F.sum(F.when(F.col("side") == "r", F.col("c")).otherwise(0))
        .alias("cr"),
    )
    # per (id, gap): squared-cosine ppm — agg 3
    score = per_tok.groupBy(id_col, "ntok", "gap").agg(
        F.expr(
            "CAST(sum(cl * cr) * sum(cl * cr) * 1000000L AS BIGINT)"
            " div (sum(cl * cl) * sum(cr * cr))"
        ).alias("s")
    )
    # bounded per-doc array -> row-local depth / segment folds
    return score.groupBy(id_col, "ntok").agg(
        F.array_sort(F.collect_list(F.struct("gap", "s"))).alias("gs")
    ).withColumn("sc", F.expr("transform(gs, x -> x.s)"))


def texttiling(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 10,
    k: int = 2,
) -> DataFrame:
    """Per-gap tiling scores and boundary flags.

    Returns ``(id_col, gap, pos, score_ppm, depth, is_boundary)`` —
    one row per inter-pseudo-sentence gap (``gap`` in ``1..P-1``,
    ``pos = gap·w`` = token offset of the candidate boundary).
    Documents with fewer than two pseudo-sentences emit nothing.
    """
    if w < 1 or k < 1:
        raise ValueError("w >= 1 and k >= 1 required")
    gid = F.col(id_col)
    arr = _gap_scores(docs, id_col, text_col, w, k)
    m = F.size("sc")
    out = (
        arr.withColumn("d", F.expr(_DEPTHS_EXPR))
        .withColumn("sd", F.expr("aggregate(d, 0L, (a, x) -> a + x)"))
        .withColumn("sd2", F.expr("aggregate(d, 0L, (a, x) -> a + x * x)"))
        .select(
            gid,
            m.alias("m"),
            "sd", "sd2",
            F.posexplode(F.expr("arrays_zip(gs, d)")).alias("j", "z"),
        )
        .select(
            gid,
            F.col("z.gs.gap").alias("gap"),
            (F.col("z.gs.gap") * w).cast("int").alias("pos"),
            F.col("z.gs.s").cast("long").alias("score_ppm"),
            F.col("z.d").cast("long").alias("depth"),
            # depth > mean - stddev/2, evaluated in exact integers
            (
                (2 * F.col("sd") - 2 * F.col("m") * F.col("z.d") < 0)
                | (
                    F.col("m") * F.col("sd2") - F.col("sd") * F.col("sd")
                    > (2 * F.col("sd") - 2 * F.col("m") * F.col("z.d"))
                    * (2 * F.col("sd") - 2 * F.col("m") * F.col("z.d"))
                )
            ).alias("is_boundary"),
        )
    )
    return out


def topic_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 10,
    k: int = 2,
    max_tokens: int = 40,
) -> DataFrame:
    """Semantic chunking: token-budget chunks that never straddle a
    TextTiling topic boundary — the composition of this module with
    the ``rag_chunks`` contract (cut where the topics shift FIRST,
    then enforce the context budget inside each topic segment).

    Pseudo-sentence cut list = {0} ∪ {boundary gaps} ∪ {P}; each
    segment is re-chunked every ``max_tokens div w`` pseudo-sentences.
    Returns ``(id_col, seg_id, chunk_id, tok_lo, tok_hi, n_tokens)``
    with ``tok_hi`` exclusive and ``chunk_id`` dense per document in
    token order.  Every chunk holds ≤ ``max_tokens`` tokens (the last
    pseudo-sentence of a document may be short — ``tok_hi`` clips to
    the document's token count).  Same scale shape as ``texttiling``;
    the segmentation/re-chunk pass adds only row-local array work.
    """
    if w < 1 or k < 1 or max_tokens < w:
        raise ValueError("w >= 1, k >= 1 and max_tokens >= w required")
    gid = F.col(id_col)
    s = max(1, max_tokens // w)  # pseudo-sentences per chunk

    # Every stage is let-bound (text.bind_col): after projection
    # collapse, a column REFERENCE inside a transform/filter lambda
    # inlines its whole expression and re-evaluates it PER ELEMENT —
    # the naive withColumn chain here measured ~0.5 s/row (the d
    # aggregate re-ran inside every bf element inside every cuts
    # element inside every ck element: O(m^5)).  Bound, it is one
    # O(m^2) pass per document.
    def _ck(cuts: Column) -> Column:
        def seg_chunks(si: Column) -> Column:
            lo, hi = F.element_at(cuts, si), F.element_at(cuts, si + 1)
            # exact int division: values are tiny pseudo-sentence
            # counts, well under 2^53
            n_ch = F.floor((hi - lo - 1) / F.lit(s)).cast("int")
            return F.transform(
                F.sequence(F.lit(0), n_ch),
                lambda t: F.struct(
                    (si - 1).alias("seg"),
                    (lo + t * s).alias("plo"),
                    F.least(lo + (t + 1) * s, hi).alias("phi"),
                ),
            )
        return F.flatten(
            F.transform(F.sequence(F.lit(1), F.size(cuts) - 1), seg_chunks)
        )

    zero = F.lit(0).cast("long")
    ck = bind_col(
        F.expr(_DEPTHS_EXPR),
        lambda d: bind_col(
            F.struct(
                F.aggregate(d, zero, lambda a, x: a + x).alias("sd"),
                F.aggregate(d, zero, lambda a, x: a + x * x).alias("sd2"),
                F.size(d).cast("long").alias("m"),
            ),
            lambda st: bind_col(
                F.transform(
                    d,
                    lambda x: (2 * st.sd - 2 * st.m * x < 0)
                    | (st.m * st.sd2 - st.sd * st.sd
                       > (2 * st.sd - 2 * st.m * x)
                       * (2 * st.sd - 2 * st.m * x)),
                ),
                lambda bf: bind_col(
                    F.concat(
                        F.array(F.lit(0)),
                        F.filter(
                            F.sequence(F.lit(1), F.size(bf)),
                            lambda g: F.element_at(bf, g),
                        ),
                        F.array(F.size(bf) + 1),
                    ),
                    _ck,
                ),
            ),
        ),
    )
    base = _gap_scores(docs, id_col, text_col, w, k).withColumn("ck", ck)
    return (
        base.select(gid, "ntok",
                    F.posexplode("ck").alias("chunk_id", "c"))
        .select(
            gid,
            F.col("c.seg").cast("int").alias("seg_id"),
            F.col("chunk_id").cast("int").alias("chunk_id"),
            (F.col("c.plo") * w).cast("int").alias("tok_lo"),
            F.least(F.col("c.phi") * w, F.col("ntok"))
            .cast("int").alias("tok_hi"),
        )
        .withColumn("n_tokens",
                    (F.col("tok_hi") - F.col("tok_lo")).cast("int"))
    )
