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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    shard_col: str,
) -> DataFrame:
    """Pack each shard's documents (ascending id) into capacity-bounded
    bins.  Returns ``(id, shard, bin, tok, fill_after, oversized)``:
    ``bin`` is the 0-based bin within the shard, ``fill_after`` the
    bin's running token total after placing the doc, ``tok`` the
    capacity-clipped token count."""
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
