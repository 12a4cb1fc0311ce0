"""Greedy sequence packing: assign documents to fixed-capacity context
windows for LLM training-batch preparation.

The reference has no training-data stage (it ships metadata to
Elasticsearch, crawler/upload.py); a 100-TB web-text pipeline ends by
packing tokenized documents into context-length bins.  True greedy
packing (keep appending until the next doc would overflow, then open a
new bin) is inherently sequential, so at cluster scale it is done
per-shard: a deterministic shard key splits the corpus, each shard
packs independently, and (shard, bin) is the global sequence id.  This
is exactly how production packers shard (each output file packs
independently) — no cross-shard coordination, no global sort.

Scale shape: ONE shard-keyed hash aggregation (collect_list →
array_sort → one ``aggregate`` fold → posexplode), the same bounded
per-group pattern as the sessionize per-key numbering
(operators/sessionize.py).  Per-group state is one shard's (id, tok)
pairs — bounded by choosing ``n_shards`` ∝ corpus size (at 10^10 docs
and 10^6 docs/shard, 10^4 shards).  No window, no Python.

Docs longer than the capacity are truncated to one full bin and
flagged ``oversized`` (the tokenizer-side truncation a real pipeline
applies); packing order within a shard is ascending id, so N-core and
4N-core runs produce identical assignments.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    shard_col: str,
    impl: str = "pandas",
) -> DataFrame:
    """Pack each shard's documents (ascending id) into capacity-bounded
    bins.  Returns ``(id, shard, bin, tok, fill_after, oversized)``:
    ``bin`` is the 0-based bin within the shard, ``fill_after`` the
    bin's running token total after placing the doc, ``tok`` the
    capacity-clipped token count.

    Default impl is a grouped-map Arrow pass (``applyInPandas`` per
    shard): the greedy walk is a linear integer loop per shard.  The
    SQL-fold twin (``impl='expr'``) appends to the accumulator array
    per doc, and ``concat(acc.out, array(...))`` COPIES the
    accumulated array each step — O(docs²) copy work per shard
    (measured ~3 s at 19k docs / 8 shards vs ~0.3 s for the Arrow
    pass).  Same shuffle shape either way: one shard-keyed exchange,
    per-group state bounded by shard size.  Equivalence is pinned by
    ``test_pack_pandas_matches_fold``."""
    if impl == "pandas":
        return _pack_sequences_pandas(df, id_col, tokens_col, capacity,
                                      shard_col)
    cap = int(capacity)
    src = df.select(
        F.col(shard_col).cast("long").alias("shard"),
        F.struct(
            F.col(id_col).cast("long").alias("id"),
            F.least(F.col(tokens_col), F.lit(cap)).cast("long").alias("tok"),
            (F.col(tokens_col) > F.lit(cap)).alias("oversized"),
        ).alias("x"),
    )
    fold = f"""aggregate(
      array_sort(docs),
      named_struct('bin', CAST(0 AS bigint), 'fill', CAST(0 AS bigint),
                   'out', CAST(array() AS
                     array<struct<id:bigint,bin:bigint,tok:bigint,
                                  fill_after:bigint,oversized:boolean>>)),
      (acc, x) -> IF(
        acc.fill + x.tok <= {cap},
        named_struct('bin', acc.bin, 'fill', acc.fill + x.tok,
          'out', concat(acc.out, array(named_struct(
            'id', x.id, 'bin', acc.bin, 'tok', x.tok,
            'fill_after', acc.fill + x.tok, 'oversized', x.oversized)))),
        named_struct('bin', acc.bin + 1, 'fill', x.tok,
          'out', concat(acc.out, array(named_struct(
            'id', x.id, 'bin', acc.bin + 1, 'tok', x.tok,
            'fill_after', x.tok, 'oversized', x.oversized))))),
      acc -> acc.out)"""
    packed = (
        src.groupBy("shard")
        .agg(F.collect_list("x").alias("docs"))
        .select("shard", F.explode(F.expr(fold)).alias("p"))
    )
    return packed.select(
        F.col("p.id").alias("id"),
        "shard",
        F.col("p.bin").alias("bin"),
        F.col("p.tok").alias("tok"),
        F.col("p.fill_after").alias("fill_after"),
        F.col("p.oversized").alias("oversized"),
    )


def _pack_sequences_pandas(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    shard_col: str,
) -> DataFrame:
    """Grouped-map twin of the SQL fold: identical greedy rule
    (ascending id; open a new bin when fill + tok would exceed
    capacity), linear per shard."""
    cap = int(capacity)
    src = df.select(
        F.col(shard_col).cast("long").alias("shard"),
        F.col(id_col).cast("long").alias("id"),
        F.least(F.col(tokens_col), F.lit(cap)).cast("long").alias("tok"),
        (F.col(tokens_col) > F.lit(cap)).alias("oversized"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # same order as the fold's array_sort over (id, tok, oversized)
        pdf = pdf.sort_values(
            ["id", "tok", "oversized"], kind="mergesort"
        ).reset_index(drop=True)
        bins, fills = [], []
        b, fill = 0, 0
        for tok in pdf["tok"]:
            t = int(tok)
            if fill + t <= cap:
                fill += t
            else:
                b += 1
                fill = t
            bins.append(b)
            fills.append(fill)
        return pd.DataFrame({
            "id": pdf["id"], "shard": pdf["shard"], "bin": bins,
            "tok": pdf["tok"], "fill_after": fills,
            "oversized": pdf["oversized"],
        })

    return src.groupBy("shard").applyInPandas(
        pack,
        "id long, shard long, bin long, tok long, fill_after long, "
        "oversized boolean",
    )


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency: ``(shard, n_docs, n_bins,
    util_ppm)`` with utilization = token total * 10^6 div
    (n_bins * capacity) — the waste metric a packer is judged on."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.max("bin") + 1).cast("long").alias("n_bins"),
            F.sum("tok").alias("_t"),
        )
        .select(
            "shard", "n_docs", "n_bins",
            F.expr(f"_t * 1000000 div (n_bins * {int(capacity)})")
            .cast("long").alias("util_ppm"),
        )
    )


def span_corruption_stats(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    rate_pct: int = 15,
    min_span: int = 2,
    span_jitter: int = 3,
    seed: int = 7,
) -> DataFrame:
    """T5/UL2 span-corruption mask accounting (Raffel et al. 2020 §3.1.4
    denoising objective): deterministic, hash-driven noise-span
    placement over each document's token sequence, reporting exactly
    what the packing/budget plane needs BEFORE materializing examples
    — encoder/decoder lengths after sentinel substitution.

    Deterministic replayable rule (both engines walk it identically):
    token i (1-based) STARTS a noise span iff i is past the previous
    span's end and md5(seed:id:i) mod 100 < rate_pct; the span runs
    ``min_span + md5(seed:id:i:L) mod span_jitter`` tokens (2-4 by
    default, mean 3 — the T5 configuration), clamped at the document
    end. Sequential exclusion (a span suppresses starts inside
    itself) makes this a ROW-LOCAL integer left fold over the token
    index sequence — one pass, no explode, no shuffle; the DuckDB twin
    is the same fold via list_reduce over struct_pack accumulators.

    Output per document: (id, n_tokens, n_spans, n_noise,
    corrupted_ppm, enc_len, dec_len) where enc_len = n_tokens −
    n_noise + n_spans (each span collapses to one sentinel) and
    dec_len = n_noise + n_spans + 1 (sentinels + EOS) — the T5 target
    layout. Empty/NULL docs emit zeros with NULL corrupted_ppm.
    """
    from biothings_crawler_spark.operators.text import words_col

    ids = F.col(id_col).cast("string")
    n = F.size(words_col(F.col(text_col)))

    def coin(i: F.Column, tag: str) -> F.Column:
        s = F.concat(F.lit(f"{seed}:"), ids, F.lit(":"),
                     i.cast("string"), F.lit(tag))
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")

    zero = F.struct(
        F.lit(0).cast("long").alias("nf"),
        F.lit(0).cast("long").alias("ns"),
        F.lit(0).cast("long").alias("nn"),
    )

    def step(acc: F.Column, i: F.Column) -> F.Column:
        start = (i >= acc.getField("nf")) & (coin(i, "") % 100 < rate_pct)
        ln = F.lit(min_span) + coin(i, ":L") % span_jitter
        take = F.least(ln, n - i + 1)
        return F.struct(
            F.when(start, i + ln).otherwise(acc.getField("nf"))
            .cast("long").alias("nf"),
            F.when(start, acc.getField("ns") + 1)
            .otherwise(acc.getField("ns")).cast("long").alias("ns"),
            F.when(start, acc.getField("nn") + take)
            .otherwise(acc.getField("nn")).cast("long").alias("nn"),
        )

    folded = F.when(n >= 1, F.aggregate(
        F.sequence(F.lit(1).cast("long"), n.cast("long")), zero, step,
    )).otherwise(zero)

    out = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(n, F.lit(0)).cast("long").alias("n_tokens"),
        folded.alias("_f"),
    ).select(
        "id", "n_tokens",
        F.col("_f.ns").alias("n_spans"),
        F.col("_f.nn").alias("n_noise"),
    )
    return out.select(
        "id", "n_tokens", "n_spans", "n_noise",
        F.when(F.col("n_tokens") > 0,
               F.expr("n_noise * 1000000 div n_tokens"))
        .cast("long").alias("corrupted_ppm"),
        (F.col("n_tokens") - F.col("n_noise") + F.col("n_spans"))
        .cast("long").alias("enc_len"),
        (F.col("n_noise") + F.col("n_spans") + 1).cast("long")
        .alias("dec_len"),
    )


def packing_fragmentation(packed: DataFrame) -> DataFrame:
    """Cross-document attention accounting per packed bin — the
    CONTAMINATION metric of sequence packing that utilization
    (packing_stats) does not see: without block-diagonal attention
    masking, a packed context of docs sized n_1..n_k exposes
    T² − Σ n_i² cross-document attention pairs (T = Σ n_i), which is
    exactly what mask-aware training must zero out.  Per (shard, bin):

    * ``n_docs``, ``tokens``  — composition.
    * ``intra_pairs``  = Σ n_i²  (the legitimate attention volume).
    * ``cross_ppm``    = (T² − Σ n_i²)·10⁶ div T²  — the share of the
      full attention matrix that is cross-document leakage if the
      packer's consumer forgets the mask.

    One hash aggregation over the packer's output; every column is an
    exact integer.
    """
    g = packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("tokens"),
        F.sum(F.col("tok") * F.col("tok")).cast("long")
        .alias("intra_pairs"),
    )
    return g.select(
        "shard", "bin", "n_docs", "tokens", "intra_pairs",
        F.expr(
            "(tokens * tokens - intra_pairs) * 1000000"
            " div greatest(tokens * tokens, 1)"
        ).cast("long").alias("cross_ppm"),
    )
