"""Scalar quantization for embedding columns — the storage/bandwidth
path for ANN at 10^10 vectors: per-vector min/max 8-bit quantization
shrinks an array<float> index 4x (and the shuffle/scan bytes with it),
at a small recall cost the pytest suite measures against the
full-precision top-k.

Everything is expression-level and cross-engine exact: arithmetic is
done in DOUBLE on both engines, and the quantized code uses explicit
floor(x + 0.5) rounding (Spark's round() is HALF_UP, DuckDB's is
banker's — floor(+0.5) sidesteps the difference), so the DuckDB twin
reproduces codes bit-for-bit and the driver gate can verify the
quantizer itself, not just its downstream effect.

At scale the quantized index is what gets persisted/partitioned:
write_quantized_ivf_index stores 8-bit codes in the same
cell-partitioned layout as operators/similarity.write_ivf_index, and
ivf_quantized_topk probes it with the identical partition-pruned plan;
dequantization happens on the probe sliver, never the full table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dedup import cosine_col
from biothings_crawler_spark.operators.text import bind_col

Q_LEVELS = 255  # 8-bit codes 0..255


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, vmin, vmax, qvec, *extra_cols): per-vector affine 8-bit
    codes q = floor((x - vmin) * 255 / (vmax - vmin) + 0.5). A constant
    vector (vmax == vmin) quantizes to all-zero codes and dequantizes
    back to vmin exactly. ``extra_cols`` are carried through untouched
    (e.g. the IVF cell assignment for the partitioned index).

    The (vmin, vmax) pair is let-bound (text.bind_col) around the code
    transform: referenced directly inside the lambda, array_min/
    array_max re-evaluate PER ELEMENT (Catalyst does not hoist
    loop-invariant children out of lambda bodies), making the
    projection O(d^2) per row — measured 4x slower at d=64."""
    v = F.col(vec_col)
    vmin = F.array_min(v).cast("double")
    vmax = F.array_max(v).cast("double")

    def _codes(mm: Column) -> Column:
        lo, hi = mm["lo"], mm["hi"]
        rng = hi - lo
        return F.transform(
            v,
            lambda x: F.when(rng > 0,
                             F.floor((x.cast("double") - lo) * Q_LEVELS / rng
                                     + F.lit(0.5)))
            .otherwise(F.lit(0)).cast("int"),
        )

    qvec = bind_col(F.struct(vmin.alias("lo"), vmax.alias("hi")), _codes)
    return df.select(
        F.col(id_col).alias("vec_id"),
        vmin.alias("vmin"),
        vmax.alias("vmax"),
        qvec.alias("qvec"),
        *[F.col(c) for c in extra_cols],
    )


def dequantize_col(qvec: Column, vmin: Column, vmax: Column) -> Column:
    """array<double> reconstruction: x' = vmin + q * (vmax - vmin)/255."""
    rng = (vmax - vmin) / F.lit(float(Q_LEVELS))
    return F.transform(qvec, lambda q: vmin + q.cast("double") * rng)


def write_quantized_ivf_index(cells: DataFrame, path: str) -> None:
    """Persist an assign_cells output (vec_id, v, cell) as the
    QUANTIZED on-disk IVF index: 8-bit codes + per-vector (vmin, vmax),
    parquet PARTITIONED BY cell — the module docstring's claim made
    real: the cell-partitioned layout of similarity.write_ivf_index
    with qvec in place of v, 4x smaller on disk and in scan bytes.
    Probes prune to nprobe cells exactly as with the full-precision
    index (dynamic partition pruning; plan-asserted in pytest), and
    dequantization happens only on the probe sliver."""
    quantize_embeddings(cells, "vec_id", "v", extra_cols=("cell",)).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)


def ivf_quantized_topk(
    qindex: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over the QUANTIZED cell-partitioned index: pick the
    nprobe nearest cells per query against the (full-precision)
    centroids, broadcast the probes into the index scan (partition
    pruning keeps the read at nprobe/C of the table), then dequantize
    ONLY the probed sliver and rank by exact-arithmetic cosine. Same
    probe shape as similarity.ivf_topk — the index rows differ (codes,
    not floats), the plan does not."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qc = q.join(F.broadcast(centroids)).withColumn(
        "sim", cosine_col(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cell"))
    )
    scored = (
        qindex.join(F.broadcast(probes), "cell")
        .withColumn("v", dequantize_col(F.col("qvec"), F.col("vmin"), F.col("vmax")))
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_rerank_topk(
    qindex: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    full_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    rerank_factor: int = 4,
) -> DataFrame:
    """Two-stage retrieval — the standard ANN serving shape at 10^10
    vectors: stage 1 recalls ``k * rerank_factor`` candidates per query
    from the 8-bit QUANTIZED cell-partitioned index (cheap scan, 4x
    fewer bytes, DPP-pruned to nprobe cells); stage 2 re-scores ONLY
    those candidates against the FULL-PRECISION vectors (one equi-join
    on vec_id — at k*factor rows per query, a sliver) and re-ranks by
    exact cosine. Quantization error can reorder or drop near-ties;
    reranking restores the full-precision order among everything the
    coarse stage recalled, so recall@k is bounded below by the
    quantized stage's recall@(k*factor) — strictly better than
    quantized-only at the same probe cost (pytest-measured)."""
    cand = ivf_quantized_topk(
        qindex, centroids, queries, id_col, vec_col,
        k=k * rerank_factor, nprobe=nprobe,
    ).select("query_id", "vec_id")
    full = full_vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("fv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    rescored = (
        cand.join(full, "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", cosine_col(F.col("qv"), F.col("fv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def quantized_brute_topk(
    qcorpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact-arithmetic top-k over the QUANTIZED corpus (dequantize ->
    cosine) against full-precision query vectors — the serving path
    when the index is stored as 8-bit codes. Same shape as
    similarity.brute_force_topk: broadcast queries, no corpus
    shuffle."""
    c = qcorpus.select(
        "vec_id", dequantize_col(F.col("qvec"), F.col("vmin"), F.col("vmax")).alias("v")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", cosine_col(F.col("qv"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_drift(
    snap_a: DataFrame,
    snap_b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    warn_below_ppm: int = 900_000,
) -> DataFrame:
    """Per-stratum embedding-centroid drift between two corpus
    snapshots — the VECTOR lane of the drift plane (CUSUM/KS/profile
    gates watch scalars; a retrained or corrupted encoder moves
    centroids long before scalar stats notice).

    The metric is defined in CODE SPACE: each vector's 8-bit affine
    codes (quantize_embeddings) summed per (label, dim) — integer sums
    are ORDER-INDEPENDENT, so the statistic is exact and
    partitioning-invariant, which float centroids are not (float
    addition does not commute at scale; that is why this is the
    monitored quantity rather than the float mean).  Drift per label =
    squared cosine between the two integer sum-vectors, exact ppm in
    decimal(38,0); identical snapshots give exactly 10^6.

    Scale shape: one posexplode + (label, dim) hash agg per snapshot
    (map-side combine; dims are a constant fan-out), a co-keyed join,
    one (label) fold, a 1-row-per-label output.  No windows."""
    def sums(df):
        q = quantize_embeddings(df, id_col, vec_col,
                                extra_cols=(label_col,))
        return (
            q.select(label_col, F.posexplode("qvec").alias("dim", "c"))
            .groupBy(label_col, "dim")
            .agg(F.sum("c").cast("long").alias("s"),
                 F.count(F.lit(1)).cast("long").alias("n"))
        )
    a = sums(snap_a).select(
        F.col(label_col).alias("label"), "dim",
        F.col("s").alias("sa"), F.col("n").alias("na"))
    b = sums(snap_b).select(
        F.col(label_col).alias("label"), "dim",
        F.col("s").alias("sb"), F.col("n").alias("nb"))
    j = a.join(b, ["label", "dim"])
    per = j.groupBy("label").agg(
        F.sum(F.col("sa").cast("decimal(38,0)") * F.col("sb"))
        .alias("_dot"),
        F.sum(F.col("sa").cast("decimal(38,0)") * F.col("sa"))
        .alias("_aa"),
        F.sum(F.col("sb").cast("decimal(38,0)") * F.col("sb"))
        .alias("_bb"),
        F.max("na").cast("long").alias("n_vecs_a"),
        F.max("nb").cast("long").alias("n_vecs_b"),
    )
    return per.selectExpr(
        "label",
        "n_vecs_a", "n_vecs_b",
        "CAST(_dot * _dot * 1000000 div (_aa * _bb) AS BIGINT) AS cos2_ppm",
    ).withColumn(
        "drifted",
        F.when(F.col("cos2_ppm") < warn_below_ppm, F.lit(1))
        .otherwise(F.lit(0)).cast("long"),
    )
