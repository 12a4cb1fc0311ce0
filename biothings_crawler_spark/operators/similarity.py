"""Similarity search over embedding columns (array<float>).

Two paths, sharing one cosine kernel (native zip_with/aggregate — JVM):

  * brute-force top-k — broadcast the (small) query set against the
    corpus, window top-k per query. Exact; the recall oracle. At 100 TB
    this is the wrong plan for big query sets but the right one for a
    handful of probes (broadcast join, no shuffle of the corpus).
  * IVF-style — deterministic coarse quantizer: C centroid rows sampled
    by id hash, every corpus vector assigned to its nearest centroid
    (broadcast centroids), queries probe the nprobe nearest centroid
    cells only. The corpus is partitioned by cell — the 10^10-row path:
    a query touches nprobe cells, not the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dedup import cosine_col


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """(query_id, vec_id, cosine, rank<=k); exact. Deterministic
    tie-break by vec_id."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
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


def pick_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Deterministic coarse quantizer: the n_centroids corpus rows with
    smallest hash(id) (a seeded uniform sample, reproducible at any
    parallelism; 'md5' family matches DuckDB byte-for-byte)."""
    key = F.col("centroid_id").cast("string")
    h = F.md5(key) if hash_family == "md5" else F.xxhash64(key)
    return (
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
        .orderBy(h, "centroid_id")
        .limit(n_centroids)
    )


def assign_cells(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Each vector -> nearest centroid cell with ZERO shuffle of the
    corpus: the C centroids are folded into ONE array-of-structs row,
    broadcast (single-row nested-loop join), and the argmax runs as a
    per-row array fold. The naive alternative — explode corpus x
    centroids + window min per vec_id — shuffles C x the corpus just to
    pick a per-row argmax; at 10^10 vectors that shuffle IS the job.

    Tie-break matches the window formulation it replaces: highest
    cosine, then smallest centroid_id (the fold walks centroids in
    centroid_id order and replaces only on strictly-greater sim)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    cell_type = centroids.schema["centroid_id"].dataType.simpleString()
    cent_row = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("centroid_id"), F.col("cv")))
        ).alias("cents")
    )
    scored = c.join(F.broadcast(cent_row))
    sims = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            s["centroid_id"].alias("cell"),
            cosine_col(F.col("v"), s["cv"]).alias("sim"),
        ),
    )
    best = F.aggregate(
        sims,
        F.struct(
            F.lit(None).cast(cell_type).alias("cell"),
            F.lit(-2.0).cast("double").alias("sim"),
        ),
        lambda acc, s: F.when(s["sim"] > acc["sim"], s).otherwise(acc),
    )
    return scored.select("vec_id", "v", best["cell"].alias("cell"))


def write_ivf_index(cells: DataFrame, path: str) -> None:
    """Persist the assign_cells output as the on-disk IVF index:
    parquet PARTITIONED BY cell. A probe query then reads only the
    nprobe probed cells — at 10^10 vectors the scan is pruned to
    nprobe/C of the table, either statically (literal cell filter) or
    via dynamic partition pruning when the probes side is a broadcast
    join (ivf_topk's shape; DPP is on by default). This is the
    ingest-time artifact the in-memory path in q_ann_ivf_topk stands
    in for."""
    cells.write.mode("overwrite").partitionBy("cell").parquet(path)


def read_ivf_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk(
    cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k probing the nprobe nearest cells per query.

    ``cells`` is the assign_cells output (ingest-time artifact at scale,
    written bucketed by cell)."""
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
    scored = cells.join(F.broadcast(probes), "cell").withColumn(
        "cosine", cosine_col(F.col("qv"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def truncated_brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dims: int = 16,
) -> DataFrame:
    """Matryoshka-style dimension-truncated retrieval (Kusupati et al.,
    NeurIPS 2022): rank by cosine over only the FIRST ``dims``
    components of each vector — with MRL-trained embeddings the prefix
    carries most of the signal, so a 64->16 truncation cuts index
    bytes, scan bytes, and dot-product work 4x at a measured recall
    cost. The fixture embeddings are ISOTROPIC (not MRL-trained), so
    pytest pins the mechanism rather than a production number:
    far-above-random recall, monotone in kept dims, and the serving
    pattern (truncated shortlist-100 -> full re-rank) recovering most
    of the exact top-10 (measured 0.72 on the fixture).

    Row-local ``slice`` then the exact brute-force plan — the
    truncation composes with the IVF/quantized paths the same way
    (slice before write_ivf_index for a truncated index)."""
    cut = F.slice(F.col(vec_col), 1, dims)
    return brute_force_topk(
        corpus.select(F.col(id_col), cut.alias(vec_col)),
        queries.select(F.col(id_col), cut.alias(vec_col)),
        id_col, vec_col, k,
    )
