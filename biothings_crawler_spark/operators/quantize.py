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

At scale the quantized index is what gets persisted/partitioned (see
operators/similarity.write_ivf_index — the same layout applies with
qvec in place of v); dequantization happens on the probe sliver, never
the full table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dedup import cosine_col

Q_LEVELS = 255  # 8-bit codes 0..255


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, vmin, vmax, qvec): per-vector affine 8-bit codes
    q = floor((x - vmin) * 255 / (vmax - vmin) + 0.5). A constant
    vector (vmax == vmin) quantizes to all-zero codes and dequantizes
    back to vmin exactly."""
    v = F.col(vec_col)
    vmin = F.array_min(v).cast("double")
    vmax = F.array_max(v).cast("double")
    rng = vmax - vmin
    qvec = F.transform(
        v,
        lambda x: F.when(rng > 0,
                         F.floor((x.cast("double") - vmin) * Q_LEVELS / rng
                                 + F.lit(0.5)))
        .otherwise(F.lit(0)).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        vmin.alias("vmin"),
        vmax.alias("vmax"),
        qvec.alias("qvec"),
    )


def dequantize_col(qvec: Column, vmin: Column, vmax: Column) -> Column:
    """array<double> reconstruction: x' = vmin + q * (vmax - vmin)/255."""
    rng = (vmax - vmin) / F.lit(float(Q_LEVELS))
    return F.transform(qvec, lambda q: vmin + q.cast("double") * rng)


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
