"""Deterministic random walks over the link graph — the DeepWalk /
node2vec (p = q = 1) corpus generator (Perozzi et al. KDD 2014): W
truncated walks from every node whose visit sequences feed skip-gram
embedding training exactly like text windows feed word2vec.

Why deterministic: a sampled walk corpus that changes per run breaks
both resume-identity (the north rule) and oracle pairing. The "coin"
for (cur, walk, step) is a 60-bit md5 slice — byte-identical in DuckDB
— and the step moves to the (coin mod out-degree)-th neighbor in
dst-sorted order, so the full walk corpus is a pure function of the
graph. Different walk ids / steps draw different coins, so the W walks
per node genuinely diverge.

Scale shape: neighbor ranks are ONE row_number window partitioned by
src (partition size = out-degree — page out-degree is bounded by page
size, never corpus size) built once; then each of the L steps is one
equi-join of the walk frontier against the degree table + one against
the (src, rk) neighbor table — delta iteration, shuffle volume = live
walks, lineage checkpointed per step. Walks hitting a sink stop
(standard truncation); no per-walk Python, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _coin(cur, walk, step: int):
    """60-bit positive integer from md5('cur_walk_step') — the shared
    Spark/DuckDB coin (15 hex chars < 2^60, so no sign issues)."""
    key = F.concat_ws(
        "_", cur.cast("string"), walk.cast("string"), F.lit(str(step))
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def random_walks(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    walk_len: int = 4,
    walks_per_node: int = 2,
) -> DataFrame:
    """(start, walk, step, cur): every visit of every walk — the
    corpus rows skip-gram windows read. step 0 is the start node;
    walks truncate at sinks."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    nb = e.withColumn(
        "rk", F.row_number().over(Window.partitionBy("src").orderBy("dst"))
    ).localCheckpoint(eager=True)
    deg = nb.groupBy("src").agg(F.max("rk").alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = nodes.join(
        F.broadcast(
            nodes.sparkSession.range(walks_per_node).select(
                F.col("id").cast("long").alias("walk")
            )
        )
    ).select(
        F.col("node").alias("start"), "walk",
        F.lit(0).cast("long").alias("step"),
        F.col("node").alias("cur"),
    ).localCheckpoint(eager=True)

    out = state
    for step in range(walk_len):
        coin = _coin(F.col("cur"), F.col("walk"), step)
        hop = (
            state.join(deg, state.cur == deg.src)
            .withColumn("pick", F.pmod(coin, F.col("deg")) + 1)
            .join(
                nb.select(F.col("src").alias("cur2"), "rk", "dst"),
                (F.col("cur") == F.col("cur2")) & (F.col("rk") == F.col("pick")),
            )
            .select(
                "start", "walk",
                (F.col("step") + 1).cast("long").alias("step"),
                F.col("dst").alias("cur"),
            )
            .localCheckpoint(eager=True)
        )
        state = hop
        out = out.unionByName(hop)
    return out
