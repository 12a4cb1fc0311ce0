"""Integer-arithmetic PageRank over the crawl link graph — frontier
prioritization beyond the reference's breadth-first ordering (its
scheduler is FIFO-per-round, crawler/spiders/helper.py; a 10^10-URL
frontier wants to fetch authoritative hosts first).

Why integer arithmetic: floating-point PageRank sums are
partial-aggregation-order dependent, which breaks both determinism
under parallelism (the north rule) and cross-engine oracle equality.
Here ranks are BIGINT micro-units (``scale`` = 1.0) and every edge
contribution is ``(damping_pct * r) div (100 * out_degree)`` — exact
integer floor division, so sums commute and Spark == DuckDB bit for
bit at any partitioning. The truncation loses < 1 micro-unit per edge
per iteration (documented, deliberate).

Scale shape (the Pregel-lite pattern shared with
dedup.connected_components and streaming redirect tracing): one
edges⋈ranks hash join + one groupBy(dst) partial-agg per iteration,
with ``localCheckpoint(eager=True)`` truncating lineage each round so
k iterations never replan k joins. Dangling nodes (no out-edges) leak
their damped mass — the standard simplification; ranks remain a valid
priority order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Ranks after ``iters`` synchronous iterations: (node, rank) with
    rank in integer micro-units (initial rank = ``scale`` per node).

    base = (100 - damping_pct) * scale div 100, and each iteration
    r'(v) = base + Σ_{u→v} (damping_pct * r(u)) div (100 * deg(u)).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (100 - damping_pct) * scale // 100

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst",
                F.expr(f"({damping_pct} * rank) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("in_sum", F.lit(0))).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def allocate_budget(
    ranks: DataFrame,
    host: Column,
    total_budget: int = 100_000,
    min_quota: int = 1,
) -> DataFrame:
    """Rank-mass-proportional crawl-budget allocation:
    ``(host, mass, quota)`` with quota = ``mass * total_budget div
    total_mass`` (floor, clamped to ``min_quota``).

    Closes the loop between the priority plane and the politeness
    plane: PageRank mass says where the frontier's value concentrates;
    the politeness window (operators/politeness.select_politely) can
    take these quotas as per-host budgets instead of a flat constant —
    the reference's fixed CONCURRENT_REQUESTS_PER_DOMAIN generalized
    to an importance-weighted schedule.

    Exact integers end-to-end (micro-unit ranks in, floor-division
    quotas out).  Shape: one host-keyed hash agg over the rank table +
    a 1-row totals broadcast join — nothing heavier than the skew
    report's plan.
    """
    hm = ranks.groupBy(host.alias("host")).agg(
        F.sum("rank").cast("long").alias("mass")
    )
    t = hm.agg(F.sum("mass").cast("long").alias("total"))
    # mass is in 10^12-unit ranks — the product mass * budget overflows
    # a BIGINT at corpus scale, so the share ratio runs in DECIMAL(38,0)
    # (HUGEINT on the DuckDB side); `div` floors back to a LONG quota.
    share = F.expr(
        f"CAST(mass AS DECIMAL(38,0)) * {int(total_budget)} div total"
    )
    return hm.join(F.broadcast(t)).select(
        "host", "mass",
        F.greatest(share, F.lit(int(min_quota))).cast("long").alias("quota"),
    )
