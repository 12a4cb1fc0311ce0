"""Product quantization for embedding ANN (Jégou, Douze & Schmid 2011,
"Product quantization for nearest neighbor search" — public
literature): split each vector into M subvectors, code each against a
per-subspace codebook of K centroids, and answer queries with
asymmetric distance computation (ADC) — the query stays full
resolution, candidates are M small integers.

Index cost: M * ceil(log2 K) bits per vector — with M=16, K=16 that
is 8 BYTES per 64-dim vector, a 32x compression over float32 (and 8x
over the scalar-quantized codes it is built from), which is what makes
10^10-vector candidate scans bandwidth-feasible at all.  The defaults
are tuned on the synthetic high-entropy fixture embeddings (recall@10
~0.55 vs exact on the quantized domain; m=8 halves the bytes at ~0.3
recall, m=32 doubles them at ~0.7 — pick per corpus).

Everything runs on the INTEGER 8-bit domain of
operators/quantize.quantize_embeddings, so every distance is an exact
BIGINT and the DuckDB oracle replays codebooks, codes, and ADC scores
bit-for-bit: md5-ordered deterministic seeds (the kmeans/IVF seeding)
refined by Lloyd rounds with exact integer floor-means (the
operators/clustering.kmeans_lloyd arithmetic).

Scale shapes:

* codebooks — M*K rows total, broadcast everywhere; each Lloyd round
  is one broadcast argmin + one (sub, cid, pos) hash agg;
* encode — explode to (vec_id, sub), broadcast-join the K*M codebook,
  one argmin hash agg back to (vec_id, codes): per-row work M*K, one
  keyed shuffle;
* ADC — the (query, sub, cid) lookup table is Q*M*K rows, broadcast;
  candidates explode to (vec_id, sub, code) and hash-agg the partial
  distances; per-query top-k over a bounded window.  At 10^10 vectors
  you compose this with the IVF cell partitioning
  (operators/similarity) so the candidate explode covers probed cells
  only — the join/agg shapes are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PQ_M = 16      # subspaces
PQ_K = 16      # centroids per subspace


def _subvectors(qt: DataFrame, m: int, id_alias: str = "vec_id") -> DataFrame:
    """(id, sub, sv): subspace ``sub`` takes dims
    [sub*d/m, (sub+1)*d/m) of the quantized vector, as BIGINTs."""
    return qt.select(
        F.col("vec_id").alias(id_alias),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "qvec",
    ).select(
        id_alias, "sub",
        F.expr(f"transform(sequence(1, size(qvec) div {m}), "
               f"j -> cast(element_at(qvec, cast(sub * (size(qvec) div {m})"
               f" + j as int)) as bigint))").alias("sv"),
    )


def pq_codebooks(
    qt: DataFrame, m: int = PQ_M, k: int = PQ_K, rounds: int = 2,
) -> DataFrame:
    """Per-subspace codebooks ``(sub, cid, cv)``: ``k`` md5-ordered
    deterministic seeds (sample rank = centroid id) refined by
    ``rounds`` Lloyd iterations with exact integer floor-means (the
    operators/clustering.kmeans_lloyd arithmetic), all subspaces
    trained jointly in one plan per round.  Empty cells carry their
    previous centroid over, so the codebook always has exactly k
    entries per subspace."""
    ranked = (
        qt.select("vec_id", "qvec")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select(
            (F.row_number().over(
                Window.orderBy(F.md5(F.col("vec_id").cast("string")),
                               "vec_id")) - 1).alias("cid"),
            "qvec",
        )
    )
    books = _subvectors(
        ranked.select(F.col("cid").alias("vec_id"), "qvec"), m, "cid"
    ).select("sub", "cid", F.col("sv").alias("cv"))
    sv = _subvectors(qt, m).localCheckpoint(eager=True)
    for _ in range(rounds):
        best = (
            sv.join(F.broadcast(books), "sub")
            .select("vec_id", "sub", "cid",
                    F.expr(_d2("sv", "cv")).alias("d2"))
            .groupBy("vec_id", "sub")
            .agg(F.min(F.struct("d2", "cid")).alias("w"))
            .select("vec_id", "sub", F.col("w.cid").alias("cid"))
        )
        sums = (
            best.join(sv, ["vec_id", "sub"])
            .select("sub", "cid", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("cnt"))
        )
        fresh = (
            sums.select(
                "sub", "cid", "pos",
                F.expr("(s - ((s % cnt) + cnt) % cnt) div cnt").alias("mv"),
            )
            .groupBy("sub", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mv")))
                 .alias("pm"))
            .select("sub", "cid",
                    F.expr("transform(pm, e -> e.mv)").alias("cv"))
        )
        books = fresh.unionByName(
            books.join(fresh.select("sub", "cid"), ["sub", "cid"],
                       "left_anti")
        ).localCheckpoint(eager=True)
    return books


def _d2(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"0L, (acc, v) -> acc + v)")


def pq_encode(qt: DataFrame, books: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, codes array<int>): each subvector coded to its nearest
    centroid by exact integer L2, ties to the smaller cid."""
    sv = qt.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "qvec",
    ).select(
        "vec_id", "sub",
        F.expr(f"transform(sequence(1, size(qvec) div {m}), "
               f"j -> cast(element_at(qvec, cast(sub * (size(qvec) div {m})"
               f" + j as int)) as bigint))").alias("sv"),
    )
    best = (
        sv.join(F.broadcast(books), "sub")
        .select("vec_id", "sub", "cid", F.expr(_d2("sv", "cv")).alias("d2"))
        .groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d2", "cid")).alias("w"))
        .select("vec_id", "sub", F.col("w.cid").alias("code"))
    )
    return (
        best.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code")))
             .alias("sc"))
        .select("vec_id",
                F.expr("transform(sc, s -> cast(s.code as int))")
                .alias("codes"))
    )


def pq_topk_adc(
    queries: DataFrame,
    books: DataFrame,
    codes: DataFrame,
    k: int = 10,
    m: int = PQ_M,
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, adc_d2, rank).  The query keeps
    its full quantized vector; each candidate costs M lookups in the
    broadcast (query, sub, cid) partial-distance table."""
    qs = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "qvec",
    ).select(
        "query_id", "sub",
        F.expr(f"transform(sequence(1, size(qvec) div {m}), "
               f"j -> cast(element_at(qvec, cast(sub * (size(qvec) div {m})"
               f" + j as int)) as bigint))").alias("sv"),
    )
    lut = (
        qs.join(F.broadcast(books), "sub")
        .select("query_id", "sub", "cid",
                F.expr(_d2("sv", "cv")).alias("pd2"))
    )
    cand = codes.select(
        "vec_id", F.posexplode("codes").alias("sub", "code"))
    scored = (
        cand.join(
            F.broadcast(lut),
            (cand["sub"] == lut["sub"]) & (cand["code"] == lut["cid"]),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd2").cast("long").alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        scored.select("query_id", "vec_id", "adc_d2",
                      F.row_number().over(w).cast("long").alias("rank"))
        .filter(F.col("rank") <= k)
    )
