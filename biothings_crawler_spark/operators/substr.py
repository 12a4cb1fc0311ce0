"""Exact-substring duplicate-span detection (ExactSubstr dedup).

Finds, for every document, the maximal character spans that are covered
by length-``L`` windows occurring two or more times anywhere in the
corpus — the practical formulation of suffix-array exact-substring
training-data dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022): any duplicated substring of length
``>= L`` is a union of duplicated ``L``-windows, so marking duplicated
windows and merging overlapping/adjacent ones recovers exactly the
maximal removable regions.

Reference parity: the reference crawler (biothings.crawler) dedups at
whole-record granularity only (its pipelines drop already-seen ``_id``s,
crawler/upload.py); sub-document exact dedup is the training-data
extension this engine adds on top, per the brief.

Spark-first plan (one shuffle for the corpus-wide window count, one
narrow window for the per-doc merge):

  1. explode each doc into its ``n - L + 1`` window start positions
     with ``posexplode(sequence(...))`` — pure JVM, stays inside
     whole-stage codegen; docs shorter than ``L`` are filtered out
     before the sequence so Spark's descending-``sequence(0, -k)``
     footgun can't fire;
  2. hash each window with ``xxhash64(substring(...))`` — we ship the
     8-byte hash to the shuffle instead of the ``L``-byte gram, an
     ``L/8``x reduction of the one corpus-wide exchange.  A false merge
     needs an xxhash64 collision between two of the corpus's distinct
     windows: at 10^12 windows (a ~1 TB text corpus) the birthday bound
     is ``(10^12)^2 / 2^65 ~= 2.7e-5`` expected collisions corpus-wide
     — and a collision only perturbs output if the two colliding grams
     are also each otherwise-unique.  The DuckDB oracle groups by the
     literal gram string, so the driver gate additionally proves the
     hash path collision-free at fixture scale;
  3. ``groupBy(hash)`` keeping ``count`` and the (doc, pos) list —
     duplicated-hash groups explode back to marked positions.  This is
     aggregate-then-explode rather than count-then-join-back: ONE
     exchange instead of two, and the group payload is bounded because
     window multiplicity is bounded by doc multiplicity;
  4. per-doc gaps-and-islands merge: a window over ``(doc_id, pos)``
     — ``lag`` flags a break when the next marked start is more than
     ``L`` past the previous (strictly-greater: spans that touch are
     one contiguous removable region), a running sum numbers islands,
     and a final hash aggregate emits ``[min(pos), max(pos) + L)``.
     The window partitions by doc, so it never shuffles more than the
     marked subset and its sort is per-doc-local.

At 100 TB the dominant cost is step 2/3's exchange of ``total_chars``
8-byte hashes (+16 bytes of doc/pos) — the same asymptotic shuffle
volume as the distributed suffix-array alternative's first sort pass,
without the ``log n`` prefix-doubling repeats, which is why the
windowed-hash formulation is the one production pipelines (e.g.
deduplicate-text-datasets' Spark ports) actually run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicated_spans", "strip_spans"]


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """One row per maximal duplicated span: ``(id_col, span_start,
    span_end, span_len)``, ``span_start`` 0-based inclusive,
    ``span_end`` exclusive.  ``hash_family='md5'`` swaps the window key
    to a 64-bit md5 prefix (bit-identical in DuckDB) for oracle runs;
    xxhash64 is the production path."""
    L = int(min_len)
    d = docs.select(
        F.col(id_col).alias("_sid"), F.col(text_col).alias("_st")
    ).filter(F.length("_st") >= L)
    # The explode below fans each doc out ~len(text)-fold, so upstream
    # partitioning is the parallelism of the whole window-hash stage.
    # At warehouse scale the scan arrives in many splits and this is a
    # no-op; a small single-file fixture corpus would otherwise run the
    # fan-out on ONE core (and AQE then coalesces the modest shuffle to
    # one reducer too — 26x observed slowdown at sf0.1).
    par = d.sparkSession.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par)

    pos = d.select(
        "_sid",
        F.explode(
            F.sequence(F.lit(0), F.length("_st") - L)
        ).alias("pos"),
        "_st",
    )
    gram = F.substring(F.col("_st"), F.col("pos") + 1, L)
    if hash_family == "md5":
        key = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    else:
        key = F.xxhash64(gram)
    occ = pos.select("_sid", "pos", key.alias("wkey"))

    # Corpus-wide duplicate keys via a PLAIN count aggregate (Tungsten
    # hash agg with map-side partials — a collect_list formulation
    # would plan as ObjectHashAggregate, which silently falls back to
    # SORT-BASED past 128 distinct keys per partition and turns the
    # whole stage into a per-task sort of every window).  The dup-key
    # set is then semi-joined back against a re-computed occ: the
    # re-computation is one cheap codegen map stage, and the join side
    # is tiny relative to the corpus (only keys with count >= 2), so
    # AQE picks a broadcast semi-join at runtime — occ itself is never
    # shuffled a second time; at scales where the dup set outgrows the
    # broadcast threshold AQE degrades it to a co-partitioned SMJ,
    # which is the correct plan there too.
    dup = occ.groupBy("wkey").agg(
        F.count(F.lit(1)).alias("_c")
    ).filter(F.col("_c") >= 2).select("wkey")
    marked = occ.join(dup, "wkey", "left_semi").select("_sid", "pos")

    w = Window.partitionBy("_sid").orderBy("pos")
    brk = marked.select(
        "_sid",
        "pos",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > L),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    isl = brk.select(
        "_sid",
        "pos",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return (
        isl.groupBy("_sid", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + L).cast("long").alias("span_end"),
        )
        .select(
            F.col("_sid").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def strip_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every duplicated span from every doc (the Lee et al.
    "drop all copies" policy applied symmetrically — a canonical-copy
    retention policy composes on top by anti-joining a keep-list of
    corpus-first spans first).  Spans are merged per doc in descending
    start order and cut with a left fold over ``substring``, all JVM
    expressions; the fold input is the collected span array, bounded
    because spans per doc are bounded by ``len/L``."""
    agg = spans.groupBy(id_col).agg(
        F.reverse(
            F.array_sort(F.collect_list(F.struct("span_start", "span_end")))
        ).alias("_spans")
    )
    cut = F.aggregate(
        "_spans",
        F.col(text_col),
        lambda acc, s: F.concat(
            F.substring(acc, F.lit(1), s["span_start"]),
            F.substring(
                acc, s["span_end"] + 1, F.length(acc) - s["span_end"]
            ),
        ),
    )
    joined = docs.join(agg, id_col, "left")
    return joined.select(
        id_col,
        F.when(F.col("_spans").isNull(), F.col(text_col))
        .otherwise(cut)
        .alias("text_clean"),
        F.coalesce(F.size("_spans"), F.lit(0)).cast("long").alias("n_spans"),
    )


def suffix_array(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_rounds: int = 24,
    n_partitions: int = 32,
) -> DataFrame:
    """Distributed suffix-array construction by prefix doubling
    (Manber & Myers 1990) over the doc-separated corpus string — the
    index structure under suffix-array exact-substring dedup (Lee et
    al. 2022 build exactly this over the concatenated corpus; the
    windowed ``duplicated_spans`` above is the hash approximation,
    this is the exact backbone) and BWT-style compression.

    Corpus string: documents in ``id`` order, each followed by a
    ``chr(1)`` separator; document text must not contain codepoints
    below 2 (crawl text never does after the textnorm plane). Global
    character positions come from a doc-length prefix scan, NOT a
    global window.

    Prefix doubling, DataFrame-native: ranks start as codepoints;
    round k pairs each position's rank with the rank at ``pos + 2^k``
    (0 past the end — shorter suffix sorts first, matching binary
    string comparison since UTF-8 byte order preserves codepoint
    order), then re-ranks pairs DENSELY via distinct-pairs +
    ``global_prefix_sum`` (operators/allocation.py — range repartition
    + per-partition window + broadcast offsets; no single-task global
    window anywhere) and a hash join back. The loop stops as soon as
    ranks are all distinct (suffixes are pairwise distinct by length,
    so this always happens within ``ceil(log2 n)`` rounds); lineage is
    truncated per round with localCheckpoint like every bounded loop
    in this repo.

    Scale shape per round: one self-join on position (co-partitioned
    hash join), one distinct (hash agg), one prefix scan, one pair
    join — all shuffle-bounded by corpus length; nothing quadratic,
    no driver state beyond the 32-row partition offsets. ~log2(n)
    rounds total, the textbook distributed SA bound.

    Output: (pos, rank) with rank 1..n — ``ORDER BY rank`` is the
    suffix array; ``rank BY pos`` is the inverse (the rank array
    Kasai's LCP pass consumes).
    """
    from biothings_crawler_spark.operators.allocation import (
        global_prefix_sum,
    )

    d = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    ).withColumn("n", F.length("t") + F.lit(1))
    offs = global_prefix_sum(d, ["id"], "n", n_partitions)
    chars = offs.select(
        (F.col("prefix") - F.col("n")).alias("off"), "t", "n",
        F.posexplode(F.sequence(F.lit(1), F.col("n"))).alias("_i", "i"),
    ).select(
        (F.col("off") + F.col("i")).cast("long").alias("pos"),
        F.when(F.col("i") < F.col("n"),
               F.expr("ascii(substr(t, i, 1))"))
        .otherwise(F.lit(1)).cast("long").alias("rank"),
    )
    n_total = chars.count()
    r = chars.repartition(n_partitions, "pos").localCheckpoint(eager=True)
    k = 1
    for _ in range(max_rounds):
        shifted = r.select((F.col("pos") - k).alias("pos"),
                           F.col("rank").alias("r2"))
        pairs = (
            r.withColumnRenamed("rank", "r1")
            .join(shifted, "pos", "left")
            .select("pos", "r1", F.coalesce("r2", F.lit(0)).alias("r2"))
        )
        codes = global_prefix_sum(
            pairs.select("r1", "r2").distinct()
            .withColumn("_one", F.lit(1)),
            ["r1", "r2"], "_one", n_partitions,
        ).select("r1", "r2", F.col("rank").alias("_new"))
        r = (
            pairs.join(codes, ["r1", "r2"])
            .select("pos", F.col("_new").alias("rank"))
            .repartition(n_partitions, "pos")
            .localCheckpoint(eager=True)
        )
        k *= 2
        # the dense code count m == n means every rank is now unique:
        # one cheap agg over the CODES frame (distinct-pair-sized)
        # doubles as the convergence probe, so no separate pre-round
        # check job
        if r.agg(F.max("rank")).first()[0] == n_total:
            break
    return r.select("pos", F.col("rank").cast("long").alias("rank"))
