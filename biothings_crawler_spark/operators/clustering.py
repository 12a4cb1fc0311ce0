"""Lloyd k-means over integer vector codes — the clustering plane that
coarse-trains the IVF quantizer (operators/similarity.pick_centroids is
the *init* of this loop) and feeds SemDeDup-style semantic dedup with
real learned cells instead of a one-shot hash sample.

Why integer codes: centroid means and L2 distances over floats diverge
across engines (summation order, FMA); over the 8-bit quantized codes
(operators/quantize, cross-engine bit-exact) every distance is an exact
BIGINT fold and every centroid update is an exact integer floor-mean,
so the full iterative algorithm — not just one step — is verifiable
against the DuckDB oracle, round for round.

Scale shape (10^10 vectors, dim d, k cells, R rounds):

  * assignment NEVER shuffles the corpus: the k centroids fold into ONE
    array-of-structs row, broadcast (single-row join), and the argmin
    runs as a per-row array fold — operators/similarity.assign_cells's
    shape with an integer-L2 kernel.
  * the update is ONE hash aggregate on (cell, pos) over the
    posexploded codes (d x rows, map-side partials; k*d result rows),
    then a k-row reassembly agg. No windows, no collect of the corpus.
  * centroids (k x d integers) are localCheckpoint-ed each round so the
    R-round plan stays flat, exactly like operators/pagerank's loop.
  * per round cost = 1 corpus scan + 1 bounded agg; R is a constant.

Reference: biothings.crawler has no clustering; this is part of the
LLM-training-data plane (SemDeDup, Abbas et al. 2023, clusters
embeddings with k-means before within-cluster dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2_col(v, cv):
    """Exact squared-L2 between two array<bigint> columns (BIGINT fold)."""
    return F.aggregate(
        F.zip_with(v, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _floor_mean(s, c):
    """Exact integer floor(s / c) for BIGINT s, positive BIGINT c,
    identical in Spark and DuckDB regardless of their `%`/`//` sign
    conventions: pmod makes (s - pmod(s, c)) exactly divisible."""
    return ((s - F.pmod(s, c)) / c).cast("bigint")


def init_centroids(vectors: DataFrame, k: int) -> DataFrame:
    """(cell, cv): the k vectors with smallest md5(vec_id) — a seeded
    uniform sample reproducible at any parallelism and byte-equal in
    DuckDB (same family as similarity.pick_centroids(hash_family='md5')).
    The cell label is the chosen row's vec_id (stable across rounds)."""
    return (
        vectors.select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
        .orderBy(F.md5(F.col("cell").cast("string")), "cell")
        .limit(k)
    )


def assign_nearest(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v, cell, dist2): each vector to its nearest centroid by
    exact integer squared-L2; ties break to the smallest cell id (the
    fold walks centroids in cell order and replaces only on strictly
    smaller distance). Zero shuffle of the corpus — one broadcast row."""
    cent_row = centroids.agg(
        F.array_sort(F.collect_list(F.struct("cell", "cv"))).alias("cents")
    )
    scored = vectors.join(F.broadcast(cent_row))
    dists = F.transform(
        F.col("cents"),
        lambda s: F.struct(
            s["cell"].alias("cell"),
            _dist2_col(F.col("v"), s["cv"]).alias("dist2"),
        ),
    )
    best = F.aggregate(
        dists,
        F.struct(
            F.lit(None).cast("bigint").alias("cell"),
            F.lit(None).cast("bigint").alias("dist2"),
        ),
        lambda acc, s: F.when(
            acc["dist2"].isNull() | (s["dist2"] < acc["dist2"]), s
        ).otherwise(acc),
    )
    return scored.select(
        "vec_id", "v", best["cell"].alias("cell"), best["dist2"].alias("dist2")
    )


def update_centroids(assigned: DataFrame, prev: DataFrame) -> DataFrame:
    """New centroid = exact integer floor-mean of the cell's vectors,
    component-wise; a cell that attracted no vectors keeps its previous
    centroid (standard Lloyd empty-cell rule). One (cell, pos) hash agg
    + one k-row reassembly agg; both bounded by k*d."""
    comp = (
        assigned.select("cell", F.posexplode("v").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
        .select("cell", "pos", _floor_mean(F.col("s"), F.col("c")).alias("m"))
    )
    new = comp.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cv")
    )
    kept = prev.join(new.select("cell"), "cell", "left_anti")
    return new.unionByName(kept)


def _assign_literal(vectors: DataFrame, cents: list) -> DataFrame:
    """assign_nearest against a driver-local centroid list — the
    centroids ride into the plan as a literal array-of-structs (sorted
    by cell, so the strict-min fold tie-breaks to the smallest cell
    exactly like assign_nearest's array_sort(collect_list(...)) row).
    Zero exchanges of any kind: not even the single-row broadcast.
    Built as ONE SQL string: k*d Column-object literals cost k*d py4j
    round-trips (~2-3 s per round measured at k=10, d=64), the parsed
    string costs one."""
    arr = "array(" + ",".join(
        f"named_struct('cell', {int(cell)}L, 'cv', array("
        + ",".join(f"{int(x)}L" for x in cv) + "))"
        for cell, cv in cents
    ) + ")"
    best = (
        f"aggregate(transform({arr}, s -> named_struct("
        "'cell', s.cell, "
        "'dist2', aggregate(zip_with(v, s.cv, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v2) -> acc + v2))), "
        "named_struct('cell', cast(null as bigint), "
        "'dist2', cast(null as bigint)), "
        "(acc, s) -> if(acc.dist2 is null or s.dist2 < acc.dist2, s, acc))"
    )
    return vectors.select(
        "vec_id", "v",
        F.expr(best + ".cell").alias("cell"),
        F.expr(best + ".dist2").alias("dist2"),
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int,
    rounds: int,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
) -> DataFrame:
    """Lloyd's algorithm, ``rounds`` fixed iterations over integer
    vector codes; returns the final assignment (vec_id, cell, dist2)
    with exact BIGINT distances. Deterministic end to end: md5-sample
    init, strict-min tie-breaks, integer floor-mean updates — the
    DuckDB oracle replays the identical rounds as MATERIALIZED CTEs.

    The k x d centroid table is bounded driver state (the same
    bounded-collect contract as the quantile bins and the release
    manifest), so the round loop keeps it as a local list: each round
    is ONE corpus-scan hash aggregate — per-cell count + d component
    sums, map-side partials, k*(d+1) result cells — collected and
    floor-meaned in Python with the identical pmod arithmetic, and the
    assignment folds over the centroids as a plan literal.  Same math
    as the assign_nearest/update_centroids pair (which remain the
    DataFrame-level primitives), ~4x fewer jobs and zero mid-round
    shuffles: the previous shape paid, per round, a fold-to-one-row
    broadcast exchange, a posexplode (cell,pos) agg, a collect_list
    reassembly agg, an empty-cell anti-join and an eager checkpoint."""
    vectors = df.select(
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("bigint")).alias("v"),
    ).localCheckpoint(eager=True)
    init = (
        vectors.select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
        .orderBy(F.md5(F.col("cell").cast("string")), "cell")
        .limit(k)
        .collect()
    )
    cents = sorted((r["cell"], list(r["cv"])) for r in init)
    if not cents:
        return vectors.select(
            "vec_id",
            F.lit(None).cast("bigint").alias("cell"),
            F.lit(None).cast("bigint").alias("dist2"),
        )
    d = len(cents[0][1])
    for _ in range(rounds):
        rows = (
            _assign_literal(vectors, cents)
            .groupBy("cell")
            .agg(
                F.expr("cast(count(1) as bigint) as c"),
                *[F.expr(f"sum(v[{j}]) as s{j}") for j in range(d)],
            )
            .collect()
        )
        # exact floor(s / c): subtract pmod(s, c) — identical to
        # update_centroids._floor_mean, bit for bit
        new = {
            r["cell"]: [
                (r[f"s{j}"] - ((r[f"s{j}"] % r["c"]) + r["c"]) % r["c"])
                // r["c"]
                for j in range(d)
            ]
            for r in rows
        }
        # empty-cell carryover: a cell that attracted nothing keeps
        # its previous centroid (standard Lloyd rule)
        cents = sorted((cell, new.get(cell, cv)) for cell, cv in cents)
    return _assign_literal(vectors, cents).select("vec_id", "cell", "dist2")
