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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _np_books(books: dict) -> "np.ndarray":
    """(m, k, dsub) int64 codebook tensor from the {sub: [(cid, cv)]}
    dict (cids are the dense ranks 0..k-1, ascending)."""
    return np.asarray(
        [[cv for _cid, cv in books[sub]] for sub in sorted(books)],
        dtype=np.int64,
    )


def _np_codes(arr: "np.ndarray", qvecs: "np.ndarray") -> "np.ndarray":
    """(n, m) int32 codes: nearest cid per subvector by exact int64 L2.
    ``argmin`` returns the FIRST minimum, i.e. ties break to the
    smaller cid — identical to min(struct(d2, cid)) over the
    cid-ascending codebook.  This kernel replaced an interpreted
    higher-order-function fold that cost ~1.2 s per 32k-subvector
    pass at M=K=16 — the JVM expression evaluator allocates per
    centroid per row; the einsum does not."""
    m, k, dsub = arr.shape
    s = qvecs[:, : m * dsub].reshape(len(qvecs), m, dsub)
    diff = s[:, :, None, :] - arr[None, :, :, :]
    d2 = np.einsum("nmkd,nmkd->nmk", diff, diff)
    return d2.argmin(axis=2).astype(np.int32)


def _encode_map(qt: DataFrame, arr: "np.ndarray") -> DataFrame:
    """(vec_id, codes array<int>) via ``mapInPandas`` — row-local Arrow
    batches, zero exchange.  mapInPandas rather than a pandas_udf
    column: a pandas UDF whose argument plan contains higher-order-
    function lambdas (e.g. quantize_embeddings' let-bound code
    transform) trips Spark's UDF extraction with an INTERNAL_ERROR
    (the minhash operator documents the same bug); the map node takes
    the whole projected input through Arrow instead, so upstream
    expression shape cannot break it.  The (m, k, dsub) tensor rides
    in the task closure (a few KB)."""
    id_type = qt.schema["vec_id"].dataType.simpleString()

    def gen(batches):
        for b in batches:
            if not len(b):
                continue
            x = np.asarray(b["qvec"].tolist(), dtype=np.int64)
            codes = _np_codes(arr, x)
            yield pd.DataFrame(
                {"vec_id": b["vec_id"],
                 "codes": [c.tolist() for c in codes]})

    return qt.select("vec_id", "qvec").mapInPandas(
        gen, f"vec_id {id_type}, codes array<int>")


def pq_codebooks(
    qt: DataFrame, m: int = PQ_M, k: int = PQ_K, rounds: int = 2,
) -> DataFrame:
    """Per-subspace codebooks ``(sub, cid, cv)``: ``k`` md5-ordered
    deterministic seeds (sample rank = centroid id) refined by
    ``rounds`` Lloyd iterations with exact integer floor-means (the
    operators/clustering.kmeans_lloyd arithmetic), all subspaces
    trained jointly in one plan per round.  Empty cells carry their
    previous centroid over, so the codebook always has exactly k
    entries per subspace.

    The M*K codebook is bounded driver state, so (exactly like
    kmeans_lloyd) the Lloyd loop holds it locally: each round is one
    Arrow-vectorized numpy argmin pass (the pq_encode kernel) feeding
    ONE (sub, cid) hash aggregate of per-dimension sums — instead of
    the previous broadcast-argmin join + posexplode (sub,cid,pos) agg
    + collect_list reassembly + empty-cell anti-join + checkpoint, per
    round.  Identical integer arithmetic, bit-for-bit."""
    seeds = (
        qt.select("vec_id", "qvec")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .collect()
    )
    spark = qt.sparkSession
    if not seeds:
        return spark.createDataFrame([], "sub int, cid int, cv array<bigint>")
    d = len(seeds[0]["qvec"])
    dsub = d // m
    books = {
        sub: [
            (cid, [int(x) for x in r["qvec"][sub * dsub:(sub + 1) * dsub]])
            for cid, r in enumerate(seeds)
        ]
        for sub in range(m)
    }
    base = qt.select("qvec")
    for _ in range(rounds):
        arr = _np_books(books)

        def agg_gen(batches, arr=arr):
            # numpy map-side partial aggregation: each Arrow batch
            # collapses to <= m*k rows of (sub, cid, cnt, per-dim sums)
            # — exact int64 sums, order-independent — instead of
            # shipping one (sub, cid, qvec) row per subvector into the
            # Spark aggregate
            m_, k_, dsub_ = arr.shape
            for b in batches:
                if not len(b):
                    continue
                x = np.asarray(b["qvec"].tolist(), dtype=np.int64)
                s = x[:, : m_ * dsub_].reshape(len(x), m_, dsub_)
                codes = _np_codes(arr, x)
                out = []
                for sub in range(m_):
                    c = codes[:, sub]
                    cnt = np.bincount(c, minlength=k_)
                    sums = np.zeros((k_, dsub_), dtype=np.int64)
                    np.add.at(sums, c, s[:, sub, :])
                    for cid in np.flatnonzero(cnt):
                        out.append((sub, int(cid), int(cnt[cid]),
                                    sums[cid].tolist()))
                yield pd.DataFrame(
                    out, columns=["sub", "cid", "cnt", "s"])

        rows = (
            base.mapInPandas(
                agg_gen, "sub int, cid int, cnt bigint, s array<bigint>")
            .groupBy("sub", "cid")
            .agg(
                F.expr("cast(sum(cnt) as bigint) as cnt"),
                *[F.expr(f"sum(s[{j}]) as s{j}") for j in range(dsub)],
            )
            .collect()
        )
        # exact floor(s / cnt) via pmod subtraction, as before
        fresh = {
            (r["sub"], r["cid"]): [
                (r[f"s{j}"] - ((r[f"s{j}"] % r["cnt"]) + r["cnt"]) % r["cnt"])
                // r["cnt"]
                for j in range(dsub)
            ]
            for r in rows
        }
        books = {
            sub: [(cid, fresh.get((sub, cid), cv)) for cid, cv in cents]
            for sub, cents in books.items()
        }
    return spark.createDataFrame(
        [(sub, cid, cv) for sub, cents in sorted(books.items())
         for cid, cv in cents],
        "sub int, cid int, cv array<bigint>",
    )


def _d2(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"0L, (acc, v) -> acc + v)")


def pq_encode(qt: DataFrame, books: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, codes array<int>): each subvector coded to its nearest
    centroid by exact integer L2, ties to the smaller cid.

    The codebook is M*K rows — bounded by contract ("broadcast
    everywhere") — so it rides into the Arrow-vectorized numpy argmin
    kernel as a task-closure tensor: encoding is ONE row-local batch
    projection, ZERO exchanges.  The previous shape paid an explode
    to (vec_id, sub), a broadcast join, an argmin shuffle agg and a
    collect_list reassembly agg — two full shuffles of the corpus
    that pure per-row arithmetic never needed.  Same strict-min
    arithmetic (ties to the smaller cid), bit-for-bit."""
    local: dict = {}
    for r in books.collect():
        local.setdefault(int(r["sub"]), []).append(
            (int(r["cid"]), [int(x) for x in r["cv"]]))
    for sub in local:
        local[sub].sort()
    if not local:
        return qt.select(
            "vec_id", F.expr("cast(null as array<int>)").alias("codes"))
    return _encode_map(qt, _np_books(local))


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
