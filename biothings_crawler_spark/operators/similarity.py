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


def maxsim_topk(
    candidates: DataFrame,
    query_vecs: DataFrame,
    doc_vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    d: int = 8,
    k: int = 10,
) -> DataFrame:
    """Late-interaction (ColBERT MaxSim, Khattab & Zaharia 2020)
    scoring: a query and a document each carry M token sub-vectors;
    score = Σ_i max_j cos(q_i, d_j). Single-vector retrieval (the
    ANN plane) collapses a document to one point; late interaction
    keeps per-token resolution and re-scores a CANDIDATE set — this
    operator is the re-scorer, candidate-agnostic like margin_mining
    (brute candidates at oracle scale, IVF/PQ probes at 10^10).

    Token vectors here are M contiguous D-dim slices of the stored
    vector (the packed multi-vector layout; a real ColBERT index
    stores exactly this shape per passage). Per-slice norms are
    computed ONCE per row, then every (i, j) interaction is one
    D-element dot fold; cosines floor to ppm integers before max/sum,
    so the DuckDB twin is exact. All row-local whole-stage-codegen
    folds — the only shuffles are the candidate join (query side
    broadcast) and the bounded per-query top-k window.

    Output: (query_id, doc_id, score_ppm, rank), rank <= k.
    """
    from pyspark.sql import Window as W

    def norms(v) -> F.Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda i: F.sqrt(F.aggregate(
                F.transform(F.sequence(F.lit(1), F.lit(d)),
                            lambda kk: F.element_at(v, i * d + kk)
                            * F.element_at(v, i * d + kk)),
                F.lit(0.0), lambda a, x: a + x)),
        )

    q = F.broadcast(query_vecs.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    ).withColumn("qn", norms(F.col("qv"))))
    dv = doc_vecs.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("dv"),
    ).withColumn("dn", norms(F.col("dv")))

    joined = candidates.join(q, "query_id").join(dv, "doc_id")

    def cos_ppm(i, j) -> F.Column:
        dot = F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(d)),
                        lambda kk: F.element_at(F.col("qv"), i * d + kk)
                        * F.element_at(F.col("dv"), j * d + kk)),
            F.lit(0.0), lambda a, x: a + x)
        return F.floor(
            dot / (F.element_at(F.col("qn"), i + 1)
                   * F.element_at(F.col("dn"), j + 1)) * 1_000_000
        ).cast("long")

    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0).cast("long"),
        lambda acc, i: acc + F.array_max(
            F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda j: cos_ppm(i, j))),
    )
    scored = joined.select(
        "query_id", "doc_id", score.alias("score_ppm"))
    w = W.partitionBy("query_id").orderBy(F.desc("score_ppm"), "doc_id")
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
