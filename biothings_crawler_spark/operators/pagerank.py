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
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Ranks after ``iters`` synchronous iterations: (node, rank) with
    rank in integer micro-units (initial rank = ``scale`` per node).

    base = (100 - damping_pct) * scale div 100, and each iteration
    r'(v) = base + Σ_{u→v} (damping_pct * r(u)) div (100 * deg(u)).

    ``init_ranks`` (node, rank) warm-starts the iteration — the
    INCREMENTAL maintenance path: after a crawl round adds edges,
    seed with the previous snapshot's converged ranks and run 1–2
    refinement iterations instead of a cold power iteration (power
    iteration converges from any start vector; a near-fixpoint start
    needs only as many rounds as the perturbation is deep — the
    standard warm-restart argument). Nodes new to the graph start at
    ``scale``; departed nodes' old rows are ignored (inner semantics
    via the nodes join). Same exact integer arithmetic, so the
    warm-started result is still oracle-verifiable."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (100 - damping_pct) * scale // 100

    if init_ranks is None:
        ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    else:
        ranks = (
            nodes.join(init_ranks.select("node", F.col("rank").alias("_r")),
                       "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_r"), F.lit(scale)).cast("long")
                .alias("rank"),
            )
        )
    for i in range(iters):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst",
                F.expr(f"({damping_pct} * rank) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contribs, nodes.node == contribs.dst, "left").select(
            "node",
            (F.lit(base) + F.coalesce("in_sum", F.lit(0))).cast("long").alias("rank"),
        )
        # rank state is single-referenced between rounds — three rounds
        # ride each checkpointed job (the seed_distance batching), so
        # lineage stays bounded at 3 join+agg layers with 1/3 of the
        # blocking materializations
        if (i + 1) % 3 == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, "Combating web
    spam with TrustRank", VLDB 2004): PageRank with the teleport mass
    restricted to a TRUSTED seed set — rank flows outward from vetted
    hosts, so link-farm neighborhoods that only cite each other decay
    toward zero instead of bootstrapping authority.  The crawl
    frontier uses it as the spam-resistant priority: schedule by
    trustrank, not raw pagerank, and farms stop buying crawl budget
    (complements the structural detector in
    :func:`biothings_crawler_spark.operators.traps.link_farm_report`).

    Same integer micro-unit arithmetic and Pregel-lite shape as
    :func:`pagerank` (one join + one partial-agg per iteration,
    lineage checkpointed); the two differences are the init vector
    (``scale`` on seeds, 0 elsewhere) and the base term, which only
    seeds receive.  Seeds are broadcast — a trusted list is curated,
    thousands at most.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(F.broadcast(sd.withColumn("_s", F.lit(1))), "node", "left")
        .select("node", F.coalesce("_s", F.lit(0)).cast("long").alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (100 - damping_pct) * scale // 100

    ranks = nodes.select(
        "node", "is_seed", (F.col("is_seed") * scale).cast("long").alias("rank")
    )
    for i in range(iters):
        contribs = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst",
                F.expr(f"({damping_pct} * rank) div (100 * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contribs, nodes.node == contribs.dst, "left").select(
            "node", "is_seed",
            (F.col("is_seed") * base + F.coalesce("in_sum", F.lit(0)))
            .cast("long").alias("rank"),
        )
        # batched lineage truncation — see pagerank
        if (i + 1) % 3 == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


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


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Integer-arithmetic HITS (Kleinberg 1999): ``(node, auth, hub)``
    micro-unit scores after ``iters`` synchronous rounds — the
    hub/authority complement to :func:`pagerank` for crawl-frontier
    prioritization (a good *hub* page is worth fetching because its
    outlinks are authorities, even when the hub itself has no inlinks).

    Each round: auth_raw(v) = Σ_{u→v} hub(u), then L1-normalize to
    ``x * scale div Σraw`` (HUGEINT/DECIMAL(38,0) product — raw×scale
    overflows a BIGINT); hubs likewise from the fresh auths.  Floor
    division in place of the classic L2 norm keeps every value an
    exact integer, so sums commute across partitions and the DuckDB
    oracle matches bit for bit (same rationale as the module
    docstring).  Requires at least one edge (an empty graph would
    divide by a zero total).

    Scale shape: per round, two edges⋈scores hash joins + two keyed
    partial aggs + two 1-row totals broadcast joins; lineage truncated
    with ``localCheckpoint`` per round like :func:`pagerank`.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _normalize(raw: DataFrame, key: str, out: str) -> DataFrame:
        # raw is consumed twice (totals + the outer join) — checkpoint
        # it so the edges⋈scores join runs once, not once per consumer.
        # The L1 total is ONE bounded row: collect it and divide by the
        # literal instead of building a broadcast exchange per
        # normalization (two fewer broadcast stages per round).  LAZY
        # checkpoint: the total's aggregate below is the first action,
        # so one job materializes raw AND answers the total — halving
        # the blocking jobs per round (politeness salt-probe pattern).
        raw = raw.localCheckpoint(eager=False)
        # an empty raw side (documented: needs >= 1 edge) leaves every
        # outer-join row NULL -> coalesce 0; divisor 1 avoids div-0
        total = raw.agg(F.sum("raw").cast("long")).first()[0] or 1
        return (
            nodes.join(raw, nodes.node == raw[key], "left")
            .select(
                "node",
                F.coalesce(
                    F.expr(f"CAST(raw AS DECIMAL(38,0)) * {scale}"
                           f" div {int(total)}"),
                    F.lit(0),
                ).cast("long").alias(out),
            )
            .localCheckpoint(eager=True)
        )

    hubs = nodes.select("node", F.lit(scale).cast("long").alias("hub"))
    auths = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs, e.src == hubs.node)
            .groupBy("dst").agg(F.sum("hub").alias("raw"))
        )
        auths = _normalize(a_raw, "dst", "auth")
        h_raw = (
            e.join(auths, e.dst == auths.node)
            .groupBy("src").agg(F.sum("auth").alias("raw"))
        )
        hubs = _normalize(h_raw, "src", "hub")
    return auths.join(hubs, "node")


def seed_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Minimum hop distance from any seed node following out-edges:
    ``(node, dist)`` for every node reachable within ``max_hops`` —
    the crawl-depth map a seeded harvest induces (the reference's
    DEPTH_LIMIT is a per-request counter, crawler/spiders/helper.py;
    over a link TABLE the same notion is a multi-source BFS).

    Delta iteration, not dense relaxation: each round joins only the
    FRONTIER (nodes first reached last round) against the edge table,
    then folds new reaches in with a min-agg — so a round's shuffle
    volume is the frontier's out-edge count, never |V|·|E|.  Rounds
    stop early when the frontier empties; lineage is truncated with
    ``localCheckpoint``.  Three hops ride each checkpointed job (the
    connected_components ``check_every`` pattern): a hop is one
    join+agg layer, so batching turns three blocking jobs + three
    ``isEmpty`` actions into one of each — past the fixpoint a hop
    joins an empty frontier, so overrunning by up to two hops inside
    the last batch costs nothing and changes nothing (the min-fold is
    idempotent there).  The frontier is a plain filter over the
    checkpointed labels, never separately materialized.
    """
    check_every = 3
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint(eager=True)
    frontier = dist
    for hop in range(1, max_hops + 1):
        reached = (
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"), F.lit(hop).cast("long").alias("dist"))
        )
        merged = (
            dist.union(reached)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if hop % check_every == 0 or hop == max_hops:
            merged = merged.localCheckpoint(eager=True)
        frontier = merged.filter(F.col("dist") == hop)
        dist = merged
        if (hop % check_every == 0 or hop == max_hops) and frontier.isEmpty():
            break
    return dist


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007) over the UNDIRECTED link graph: ``(node, label)`` after
    ``iters`` rounds, where each round every node adopts the most
    frequent label among its neighbors, smallest label on ties.

    The classic LPA is order-dependent; this variant is fully
    deterministic — synchronous updates plus the (count DESC, label
    ASC) total tie order — so the same communities come out under any
    partitioning and the DuckDB window oracle matches exactly.  Unlike
    connected components (dedup.connected_components) it splits dense
    regions joined by thin bridges: mode-of-neighbors, not reachability.

    Scale shape per round: one edges⋈labels hash join, one
    (node, label) count agg, one argmax via max(struct(cnt, -label))
    — a partial-aggregating max, no window over the full node set —
    with ``localCheckpoint`` truncating lineage each round.
    """
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = (
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").cast("long").alias("label")
    )
    for i in range(iters):
        nbr = und.join(labels, und.dst == labels.node).select(
            und.src.alias("node"), "label"
        )
        counts = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        labels = (
            counts.groupBy("node")
            .agg(F.max(F.struct("cnt", (-F.col("label")).alias("neg"))).alias("m"))
            .select("node", (-F.col("m.neg")).cast("long").alias("label"))
        )
        # batched lineage truncation — see pagerank
        if (i + 1) % 3 == 0 or i == iters - 1:
            labels = labels.localCheckpoint(eager=True)
    return labels


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over the undirected host graph via
    degree-ordered orientation (the MapReduce-era fix for "the curse of
    the last reducer", Suri & Vassilvitskii, WWW 2011): orient every
    canonical edge from the (degree, node)-smaller endpoint to the
    larger, so each triangle survives as exactly ONE directed wedge
    a->b, b->c closed by a->c, and — the scale point — the wedge join's
    fan-out per node is bounded by its ORIENTED out-degree, which the
    ordering caps near the graph's arboricity instead of the raw degree
    (a 10^7-degree hub host contributes ~0 wedges instead of ~10^14).

    Plan: canonicalize + distinct (one exchange), degree hash-agg, two
    shuffle joins to attach endpoint degrees, the wedge self-join on
    the middle node, and a semi-join back onto the oriented edge set to
    close wedges.  Returns ``(node, triangles)`` for nodes in >= 1
    triangle."""
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()

    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = (
        e.join(deg.withColumnRenamed("node", "a")
               .withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b")
              .withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
               < F.struct(F.col("db").alias("d"), F.col("b").alias("n")))
    o = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )

    o1 = o.alias("o1")
    o2 = o.alias("o2")
    wedges = o1.join(o2, F.col("o1.v") == F.col("o2.u")).select(
        F.col("o1.u").alias("x"), F.col("o1.v").alias("y"),
        F.col("o2.v").alias("z"),
    )
    tri = wedges.join(
        o.withColumnRenamed("u", "x").withColumnRenamed("v", "z"),
        ["x", "z"],
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )


def clustering_coefficients(edges: DataFrame, src: str = "src",
                            dst: str = "dst") -> DataFrame:
    """Local clustering coefficient per node over the undirected graph:
    ``C(v) = 2*T(v) / (deg(v) * (deg(v) - 1))`` as an exact ppm floor
    (Watts & Strogatz 1998) — the density-of-my-neighborhood signal
    that separates link farms (cliques, C -> 1) from genuine hubs
    (star-shaped, C -> 0) once triangle counts exist.

    Composition: the degree table is one hash agg over the canonical
    undirected edge set; triangles ride ``triangle_counts`` (degree-
    ordered wedge orientation — nothing all-pairs); the two meet in a
    single left join keyed on node.  The ppm division runs in
    decimal(38,0) so ``2 * T * 10^6`` cannot overflow a long even at
    web-scale degrees (deg 10^7 -> numerator ~10^20).  Nodes of degree
    < 2 have an undefined coefficient and are excluded (matching the
    usual convention and keeping the output total-ordered by node).

    Output: (node, deg, triangles, lcc_ppm).
    """
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .filter(F.col("deg") >= 2)
    )
    tri = triangle_counts(edges, src, dst)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node", "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
            .alias("triangles"),
            F.expr(
                "cast(cast(coalesce(triangles, 0) as decimal(38,0))"
                " * 2000000 div (cast(deg as decimal(38,0)) * (deg - 1))"
                " as bigint)"
            ).alias("lcc_ppm"),
        )
    )


def ppr_push(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    alpha_pct: int = 15,
    eps: int = 1000,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Personalized PageRank by SYNCHRONOUS forward push (Andersen,
    Chung & Lang, FOCS 2006, batched: every node whose residual
    clears ``eps`` pushes each round, instead of the sequential
    one-node-at-a-time queue — the standard distributed reshaping,
    deterministic here because the per-round update is a pure
    aggregate).  PPR from a seed set is the crawl prioritizer that
    answers "what should I fetch next to grow THIS collection" —
    topic-focused crawling's scoring function — and the
    local-community primitive (sweep cuts over p/deg).

    Integer micro-units end to end: seeds start with residual
    ``scale``; a pushing node settles ``alpha_pct * r div 100`` into
    its estimate, spreads ``(100 - alpha_pct) * r div (100 * deg)``
    to each out-neighbor (flooring leaks mass — conservative and
    deterministic, the usual integer-push trade), and dangling nodes
    settle their alpha share while the rest leaves the graph
    (documented absorption).  Sub-``eps`` residuals hold in place, so
    the worklist SHRINKS geometrically — push volume per round is
    bounded by residual mass / eps, not graph size.

    Shapes per round: one filter (the frontier), one join onto the
    degree-annotated edges (contributions), one hash agg, one slim
    rejoin; lineage truncated by localCheckpoint.  Output: (node,
    p, r) in micro-units — p the settled PPR estimate, r the
    undistributed residual.
    """
    e = edges.select(
        F.col("src").alias("src"), F.col("dst").alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(seeds.select(F.col("node")))
        .distinct()
    )
    state = nodes.join(
        seeds.select("node", F.lit(scale).cast("long").alias("_s")),
        "node", "left"
    ).select(
        "node", F.lit(0).cast("long").alias("p"),
        F.coalesce("_s", F.lit(0)).cast("long").alias("r"),
    ).localCheckpoint(eager=True)

    for _ in range(iters):
        pushers = state.filter(F.col("r") >= eps)
        contrib = (
            pushers.join(ed, pushers.node == ed.src)
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(({100 - alpha_pct}) * r)"
                       f" div (100 * deg)").alias("add_r"),
            )
            .groupBy("node")
            .agg(F.sum("add_r").cast("long").alias("add_r"))
        )
        settled = state.select(
            "node",
            F.when(F.col("r") >= eps,
                   F.col("p") + F.expr(f"({alpha_pct} * r) div 100"))
            .otherwise(F.col("p")).cast("long").alias("p"),
            F.when(F.col("r") >= eps, F.lit(0)).otherwise(F.col("r"))
            .cast("long").alias("r"),
        )
        state = (
            settled.join(contrib, "node", "left")
            .select(
                "node", "p",
                (F.col("r") + F.coalesce("add_r", F.lit(0)))
                .cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return state


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002) of the
    undirected graph, EXACT to the ppm floor — the one-number answer
    to "do hubs link to hubs?" (webgraphs are famously disassortative:
    big hubs point at small pages, r < 0; social graphs r > 0).

    The usual formula needs a sqrt — but over an undirected edge list
    where every edge contributes BOTH (d_a, d_b) and (d_b, d_a), the
    two marginals are identical, so Sx = Sy, Sxx = Syy and Pearson
    collapses to a RATIONAL number::

        r = (m2 * Sxy - Sx^2) / (m2 * Sxx - Sx^2),   m2 = 2|E|

    — exactly representable as an integer ppm floor with
    decimal(38,0) products (deg 10^7, 10^10 edges stays within 38
    digits).  Sign-correct flooring matches DuckDB's // via the
    negative-numerator CASE split.

    Shapes: degree hash agg, two slim joins to attach endpoint
    degrees, one 1-row total agg.  Output: (m2, sxy, sx, sxx, r_ppm)
    — the sufficient statistics plus the coefficient; r_ppm = 0 when
    the graph is regular (zero variance).
    """
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    keyed = (
        e.join(deg.select(F.col("node").alias("a"),
                          F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("db")), "b")
    )
    tot = keyed.agg(
        (2 * F.count(F.lit(1))).cast("long").alias("m2"),
        (2 * F.sum(F.col("da").cast("decimal(38,0)") * F.col("db")))
        .cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("da").cast("decimal(38,0)")
              + F.col("db")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("da").cast("decimal(38,0)") * F.col("da")
              + F.col("db").cast("decimal(38,0)") * F.col("db"))
        .cast("decimal(38,0)").alias("sxx"),
    )
    num = "(m2 * sxy - sx * sx)"
    den = "(m2 * sxx - sx * sx)"
    return tot.select(
        F.col("m2"),
        F.col("sxy").cast("long").alias("sxy"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sxx").cast("long").alias("sxx"),
        F.expr(
            f"cast(case when {den} = 0 then 0"
            f" when {num} < 0 then -((-{num}) * 1000000 div {den})"
            f" else {num} * 1000000 div {den} end as bigint)"
        ).alias("r_ppm"),
    )


def related_hosts(edges: DataFrame, src: str = "src", dst: str = "dst",
                  k: int = 20) -> DataFrame:
    """Link-prediction over the host graph: top-k non-adjacent node
    pairs by the Resource-Allocation index (Zhou, Lu & Zhang, EPJ B
    2009) — ``RA(x,y) = sum over common neighbors z of 1/deg(z)``,
    computed as exact integer ppm (``1000000 // deg``) so ranking is
    deterministic cross-engine.  RA is Adamic-Adar's integer-friendly
    sibling and outperforms it on dense hubs (a 10^6-degree common
    neighbor contributes ~nothing, which is also what kills the skew:
    wedges through mega-hubs are exactly the ones whose score vanishes,
    so at 100 TB the wedge join can PRE-FILTER z by a degree cap with a
    provable score-loss bound instead of salting).

    Plan: canonical undirected edges -> degree agg -> wedge self-join
    on the common neighbor -> anti-join out already-linked pairs ->
    hash-agg sum -> TakeOrderedAndProject."""
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    und = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))

    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("a", "z")

    w1 = und.select(F.col("b").alias("z"), F.col("a").alias("x"))
    w2 = und.select(F.col("a").alias("z"), F.col("b").alias("y"))
    wedges = (
        w1.join(w2, "z")
        .filter(F.col("x") < F.col("y"))
        .join(deg, "z")
        .select("x", "y", F.expr("1000000 div deg").alias("ra_ppm"))
    )
    cand = wedges.join(
        e.withColumnRenamed("a", "x").withColumnRenamed("b", "y"),
        ["x", "y"],
        "left_anti",
    )
    return (
        cand.groupBy("x", "y")
        .agg(F.sum("ra_ppm").cast("long").alias("ra_ppm"),
             F.count(F.lit(1)).cast("long").alias("common_neighbors"))
        .orderBy(F.desc("ra_ppm"), "x", "y")
        .limit(k)
    )


def k_core(edges: DataFrame, k: int, max_iters: int = 16) -> DataFrame:
    """The maximal k-core of the undirected host graph (every surviving
    node keeps >= k neighbors INSIDE the subgraph) by synchronous
    iterative peeling — the Seidman-coreness primitive behind link-spam
    cohesion analysis and TrustRank seed vetting.  Each round is one
    degree hash-agg plus two semi-joins; rounds localCheckpoint so the
    lineage stays flat (the CC/pagerank pattern), and the loop stops at
    the fixpoint (a round that drops nobody), checked with one count()
    per round.  Peeling rounds needed = the graph's degeneracy-ordering
    depth, small for web host graphs (their cores are shallow); the
    ``max_iters`` cap is a runaway guard, and hitting it raises rather
    than returning a non-core silently."""
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    und = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)

    # count carried across rounds (k_truss discipline: round r's
    # survivor count IS round r+1's input count) and the survivor
    # checkpoint is lazy, so each round runs ONE blocking job — the
    # count materializes it — instead of three (eager checkpoint +
    # two counts).
    n_before = None
    for _ in range(max_iters):
        deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select("a")
        pruned = (
            und.join(alive, "a", "left_semi")
            .join(alive.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        if n_before is None:
            n_before = und.count()
        n_after = pruned.count()
        und = pruned
        if n_after == n_before:
            return (
                und.groupBy("a").agg(F.count(F.lit(1)).cast("long")
                                     .alias("core_deg"))
                .select(F.col("a").alias("node"), "core_deg")
            )
        n_before = n_after
    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def opic(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    scale: int = PR_SCALE,
) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003): every node holds ``cash``; each round
    its cash moves to its out-neighbors in equal integer shares while
    ``history`` accumulates what the node has held. importance =
    history + cash converges toward the same order as PageRank but is
    meaningful after ANY number of rounds — which is the point for a
    crawl frontier: the crawler schedules by current cash without
    waiting for a power iteration to converge, and pages discovered
    mid-crawl join the computation with zero restart (the reference's
    FIFO scheduler has no importance notion at all).

    This is the batch-synchronous schedule (all nodes distribute each
    round — one edges⋈state join + one groupBy(dst) partial-agg,
    lineage checkpointed, exactly :func:`pagerank`'s Pregel-lite
    shape). Dangling cash goes to OPIC's virtual root and returns
    uniformly next round: two 1-row aggregates joined back by
    broadcast — no extra corpus shuffle. All arithmetic is integer
    micro-units with floor division; the sub-unit remainders of the
    per-edge shares and the uniform redistribution leak (< 1 unit per
    node per round, documented), so totals shrink negligibly but every
    value is exact and engine-identical.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))

    state = nodes.select(
        "node",
        F.lit(scale).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    )
    for _ in range(iters):
        contribs = (
            ed.join(state, ed.src == state.node)
            .select("dst", F.expr("cash div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        dang_row = (
            state.join(deg, state.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).alias("dang"))
        )
        share_row = dang_row.join(F.broadcast(n_row)).select(
            F.expr("dang div n_nodes").alias("share")
        )
        state = (
            state.join(contribs, state.node == contribs.dst, "left")
            .join(F.broadcast(share_row))
            .select(
                "node",
                (F.coalesce("in_sum", F.lit(0)) + F.col("share"))
                .cast("long").alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node", "hist", "cash",
        (F.col("hist") + F.col("cash")).cast("long").alias("importance"),
    )


def bowtie_decomposition(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Bow-tie decomposition of a directed graph (Broder et al.,
    "Graph structure in the Web", WWW 2000): pick the highest-degree
    pivot (ties to the smallest id), take CORE = the pivot's strongly
    connected component = fwd(pivot) ∩ bwd(pivot), then
    IN = bwd \\ CORE (reaches the core), OUT = fwd \\ CORE (reached
    from it), and 'other' for tendrils/disconnected mass. The famous
    web-census shape — and operationally the crawl-planner's map:
    seeds in IN/CORE cover the core+OUT for free, OUT-only seeds never
    discover the core.

    Built from two :func:`seed_distance` delta-iterations (forward and
    on reversed edges) — each round's shuffle is the frontier's edge
    fan-out, never |V|x|E| — plus one degree agg for the pivot and two
    membership left joins. ``max_hops`` is a safety cap; both BFS runs
    stop at their true fixpoint (empty frontier), which is what the
    recursive-CTE oracle computes."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    pivot = (
        deg.orderBy(F.desc("deg"), F.asc("node")).limit(1).select("node")
        .localCheckpoint(eager=True)
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd = seed_distance(e, pivot, max_hops=max_hops).select(
        "node", F.lit(1).alias("_f")
    )
    bwd = seed_distance(rev, pivot, max_hops=max_hops).select(
        "node", F.lit(1).alias("_b")
    )
    return (
        nodes.join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .select(
            "node",
            F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(),
                   F.lit("core"))
            .when(F.col("_b").isNotNull(), F.lit("in"))
            .when(F.col("_f").isNotNull(), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("component"),
        )
    )


def opic_greedy(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
    fetch_per_round: int = 64,
    scale: int = PR_SCALE,
) -> DataFrame:
    """OPIC's ADAPTIVE schedule (Abiteboul et al. §3: "fetch the page
    with the highest cash") in batch form: each round the top-B nodes
    by cash are FETCHED — only they distribute their cash (equal
    integer shares to out-neighbors, dangling cash returned uniformly
    via the virtual root) and bank it into history; everyone else's
    cash carries. This is the crawl-frontier integration the
    synchronous :func:`opic` approximates: cash IS the priority, the
    fetch set IS the round's schedule, and importance estimates grow
    exactly where the crawler has been.

    Output: (node, hist, cash, n_fetched, importance).

    Scale shape: per round one global top-B (orderBy+limit plans as
    per-partition TakeOrdered + a B-row merge — no full sort; at
    web scale B is the round's fetch budget and the same two-phase
    salted selection as politeness applies), one fetched⋈edges join +
    groupBy(dst) partial-agg, two 1-row aggregates for the dangling
    return, lineage checkpointed. Ties break to the smaller node id,
    so the schedule is deterministic and width-invariant."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))

    state = nodes.select(
        "node",
        F.lit(scale).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
        F.lit(0).cast("long").alias("n_fetched"),
    )
    for _ in range(rounds):
        sel = (
            state.orderBy(F.desc("cash"), F.asc("node"))
            .limit(fetch_per_round)
            .select(F.col("node").alias("fnode"), F.col("cash").alias("fcash"))
            .localCheckpoint(eager=True)
        )
        contribs = (
            ed.join(sel, ed.src == sel.fnode)
            .select("dst", F.expr("fcash div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        dang_row = (
            sel.join(deg, sel.fnode == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("fcash"), F.lit(0)).alias("dang"))
        )
        share_row = dang_row.join(F.broadcast(n_row)).select(
            F.expr("dang div n_nodes").alias("share")
        )
        fetched_flag = F.col("fnode").isNotNull()
        state = (
            state.join(sel, state.node == sel.fnode, "left")
            .join(contribs, state.node == contribs.dst, "left")
            .join(F.broadcast(share_row))
            .select(
                "node",
                (
                    F.when(fetched_flag, F.lit(0)).otherwise(F.col("cash"))
                    + F.coalesce("in_sum", F.lit(0)) + F.col("share")
                ).cast("long").alias("cash"),
                (F.col("hist")
                 + F.when(fetched_flag, F.col("cash")).otherwise(F.lit(0)))
                .cast("long").alias("hist"),
                (F.col("n_fetched") + fetched_flag.cast("long"))
                .cast("long").alias("n_fetched"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node", "hist", "cash", "n_fetched",
        (F.col("hist") + F.col("cash")).cast("long").alias("importance"),
    )


def salsa_authorities(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    scale: int = PR_SCALE,
) -> DataFrame:
    """SALSA authority scores (Lempel & Moran, "The stochastic approach
    for link-structure analysis", WWW 2000): the authority side of the
    alternating backward/forward random walk — from authority v step
    BACK along a uniform in-link to hub u, then FORWARD along a
    uniform out-link of u. Unlike HITS, scores are degree-normalized
    at every step, which defuses the tightly-knit-community (TKC)
    effect link farms exploit — the spam-resistant member of the
    hub/authority family (beside trustrank's seeded PageRank).

    Integer micro-units with floor division at both normalizations
    (< 1 unit lost per edge per step, documented like pagerank's), so
    sums commute and the oracle replays every round exactly.

    Shape per iteration: two edges⋈scores hash joins + two
    groupBy partial-aggs (back-step per hub, forward-step per
    authority), lineage checkpointed — 2x pagerank's Pregel-lite cost.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)  # materialize the caller's edge plan ONCE
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    eb = e.join(ind, "dst").localCheckpoint(eager=True)    # back step
    ef = e.join(outd, "src").localCheckpoint(eager=True)   # forward step

    # init at the chain's stationary shape: one ``scale`` of authority
    # mass PER IN-LINK (π(v) ∝ indeg(v) with components weighted by
    # their edge counts — Lempel & Moran §3; a uniform-per-node init
    # would wash out the component weighting). The rounds then verify
    # fixpoint stability rather than converge from scratch, and floor
    # losses are the only drift (pytest bounds them).
    auth = ind.select(F.col("dst").alias("node"),
                      (F.col("indeg") * scale).cast("long").alias("a"))
    for i in range(iters):
        hubs = (
            eb.join(auth, eb.dst == auth.node)
            .select("src", F.expr("a div indeg").alias("m"))
            .groupBy("src")
            .agg(F.sum("m").alias("m"))
        )
        auth = (
            ef.join(hubs, "src")
            .select("dst", F.expr("m div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("a"))
            .select(F.col("dst").alias("node"), "a")
        )
        # batched lineage truncation — see pagerank
        if (i + 1) % 3 == 0 or i == iters - 1:
            auth = auth.localCheckpoint(eager=True)
    return auth.select("node", F.col("a").alias("authority"))


def graph_census(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """One-row structural census of the link graph — the numbers every
    web-graph paper reports first (Broder et al. table 1) and a crawl
    operator reads before tuning salting/orientation: node and edge
    counts, RECIPROCITY (share of edges whose reverse also exists — a
    mirror/farm signal at the graph level), self-loop count, max
    in/out degree (the salting evidence), and density in ppb. All
    exact integers: reciprocity via one self-join on the edge key,
    degrees via two hash aggs — no windows, no floats."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    m = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum((F.col("src") == F.col("dst")).cast("long"))
        .cast("long").alias("n_self_loops"),
    )
    rc = recip.agg(F.count(F.lit(1)).cast("long").alias("n_recip"))
    mo = outd.agg(F.max("d").cast("long").alias("max_out"))
    mi = ind.agg(F.max("d").cast("long").alias("max_in"))
    row = n.join(m).join(rc).join(mo).join(mi)
    return row.select(
        "n_nodes", "n_edges", "n_self_loops",
        F.expr("n_recip * 1000000 div n_edges").cast("long")
        .alias("reciprocity_ppm"),
        "max_out", "max_in",
        F.expr(
            "cast(cast(n_edges as decimal(38,0)) * 1000000000"
            " div (cast(n_nodes as decimal(38,0)) * n_nodes) as bigint)"
        ).alias("density_ppb"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Newman modularity Q of a node partition over the UNDIRECTED
    simple graph (Newman & Girvan 2004) — the single number that says
    whether a community assignment (label_propagation output, host
    grouping, site families) found real structure or noise.  Q > 0.3
    on a web host graph means the partition is worth using for
    crawl sharding; Q ~ 0 means the labels are arbitrary.

    Q = sum_c [ e_c/m - (d_c/2m)^2 ]
      = (4m * sum_c e_c - sum_c d_c^2) / (4m^2)

    with m undirected edges, e_c intra-community edges, d_c the summed
    degree of community c.  Output is ONE row
    ``(n_communities, m_edges, intra_edges, q_ppm)`` with q_ppm the
    exact floor of 1e6*Q — computed entirely in integer/decimal(38,0)
    arithmetic via the shift trick (Q >= -1 always, so
    ``(1e6*(num+den)) div den - 1e6`` floors correctly with both
    operands non-negative, matching DuckDB's ``//`` semantics).

    Scale shape: canonicalize to (min,max) edge keys + distinct (one
    shuffle), two label hash-joins keyed on the node id (labels side
    is (node,label) — slim), then ONE scan of the tagged edges:
    each edge explodes into its two (community, intra-flag)
    incidences, one keyed hash agg on community, one one-row agg.
    The tagged-join output is never recomputed (no union of three
    separate aggregates over it), m and intra fall out of the same
    pass (sum d = 2m, sum intra-halves = 2*intra).  No windows, no
    floats, no driver iteration: at a 10^10-edge graph this is the
    same plan class as graph_census.  Nodes missing from ``labels``
    count as singleton communities (their own label), so a partial
    labeling is still scored correctly.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = labels.select(F.col("node"), F.col("label"))
    la = lab.withColumnRenamed("node", "a").withColumnRenamed("label", "la")
    lb = lab.withColumnRenamed("node", "b").withColumnRenamed("label", "lb")
    tagged = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("la", "a").alias("la"),
            F.coalesce("lb", "b").alias("lb"),
        )
    )
    # degree mass per community: every undirected edge adds 1 to each
    # endpoint's degree, so d_c = #incidences whose endpoint is in c;
    # the intra flag rides each incidence so m / intra / sum_d2 all
    # fall out of ONE pass over the tagged join output (sum d = 2m,
    # sum of intra halves = 2 * intra_edges).
    inc = tagged.select(
        F.explode(F.array(F.col("la"), F.col("lb"))).alias("c"),
        (F.col("la") == F.col("lb")).cast("long").alias("intra_half"),
    )
    percomm = inc.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("intra_half").cast("long").alias("intra_halves"),
    )
    row = percomm.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.expr("sum(d) div 2").cast("long").alias("m_edges"),
        F.expr("sum(intra_halves) div 2").cast("long").alias("intra_edges"),
        F.sum(F.col("d") * F.col("d")).cast("decimal(38,0)").alias("sum_d2"),
    )
    return row.select(
        "n_communities",
        "m_edges",
        "intra_edges",
        (
            F.expr(
                "cast((cast(1000000 as decimal(38,0))"
                " * (cast(4 as decimal(38,0)) * m_edges * intra_edges"
                "    - sum_d2"
                "    + cast(4 as decimal(38,0)) * m_edges * m_edges))"
                " div (cast(4 as decimal(38,0)) * m_edges * m_edges)"
                " as bigint)"
            )
            - F.lit(1000000)
        ).alias("q_ppm"),
    )


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 4,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Relative spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen,
    "Link spam detection based on mass estimation", VLDB 2006): the
    fraction of a page's PageRank that does NOT come through the
    trusted core — the complement of TrustRank, used to DEMOTE, where
    trustrank promotes.  Composition of the two existing fixed-point
    operators over one shared edge set:

        m~(p) = (PR(p) - min(PR(p), TR'(p))) / PR(p)

    where TR' is seed-teleport trustrank rescaled by n_nodes/n_seeds
    so both vectors describe the same total teleport mass (the paper's
    ``k = n/|S|`` estimator).  Emitted in parts-per-million computed as
    ``((deficit div 1000) * 1e6) div (pr div 1000)`` — the double
    down-shift keeps every intermediate inside int64 even when a hub
    node holds most of the graph's mass (pr can reach n*scale ~ 2^59;
    a direct *1e6 would overflow), and the formula is identical
    integer arithmetic in the DuckDB twin, so still cross-engine
    exact.  Scale shape: the two rank fixed points (join+agg per
    round, checkpointed), one node-keyed equi-join, one 1-row
    broadcast counts join — nothing new shuffles.
    """
    pr = pagerank(edges, iters=iters, scale=scale).withColumnRenamed("rank", "pr")
    tr = trustrank(edges, seeds, iters=iters, scale=scale).withColumnRenamed(
        "rank", "tr"
    )
    counts = pr.crossJoin(
        F.broadcast(seeds.select(F.countDistinct("node").alias("n_seeds")))
    ).crossJoin(F.broadcast(pr.select(F.count(F.lit(1)).alias("n_nodes"))))
    j = counts.join(tr, "node", "left").select(
        "node", "pr",
        F.expr("coalesce(tr, 0) * n_nodes div n_seeds").alias("tr_adj"),
    )
    return j.select(
        "node", "pr", "tr_adj",
        F.expr(
            "(((pr - least(pr, tr_adj)) div 1000) * 1000000)"
            " div (pr div 1000)"
        ).alias("spam_ppm"),
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support over canonical undirected edges
    ``(a < b)``: degree-ordered orientation (same Suri–Vassilvitskii
    wedge bound as :func:`triangle_counts`, so fan-out per node is
    capped near arboricity, not raw degree), each triangle emits its
    three canonical edges once, one hash agg counts them.  Returns
    ``(a, b, support)`` for edges in >= 1 triangle."""
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = (
        e.join(deg.withColumnRenamed("node", "a")
               .withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b")
              .withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
               < F.struct(F.col("db").alias("d"), F.col("b").alias("n")))
    o = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    o1, o2 = o.alias("o1"), o.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.v") < F.col("o2.v")),
    ).select(
        F.col("o1.u").alias("x"),
        F.col("o1.v").alias("y"),
        F.col("o2.v").alias("z"),
    )
    tri = wedges.join(
        o.select(
            F.least("u", "v").alias("cy"), F.greatest("u", "v").alias("cz")
        ),
        (F.least("y", "z") == F.col("cy"))
        & (F.greatest("y", "z") == F.col("cz")),
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array(
            F.struct(F.least("x", "y").alias("a"),
                     F.greatest("x", "y").alias("b")),
            F.struct(F.least("x", "z").alias("a"),
                     F.greatest("x", "z").alias("b")),
            F.struct(F.least("y", "z").alias("a"),
                     F.greatest("y", "z").alias("b")),
        )).alias("edge"))
        .select("edge.a", "edge.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )


def k_truss(edges: DataFrame, k: int, max_iters: int = 16) -> DataFrame:
    """The maximal k-truss of the undirected host graph (every
    surviving edge closes >= k-2 triangles INSIDE the subgraph; Cohen
    2008, "Trusses: cohesive subgraphs for social network analysis") by
    synchronous support peeling — a strictly stronger cohesion filter
    than k-core for link-farm detection, since trees and stars carry
    NO triangles at all.  Each round: one degree-oriented per-edge
    support computation + a filter; rounds localCheckpoint so lineage
    stays flat; the loop stops at the fixpoint (a round that drops no
    edge).  Returns ``(a, b, support)`` of the surviving truss with the
    support measured in the final subgraph."""
    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)

    # the round's edge count is carried across iterations (round r's
    # survivor count IS round r+1's input count — e is a pure
    # projection of the previous kept checkpoint), so each round runs
    # ONE blocking job, not a count of a frame already counted.
    n_before = None
    for _ in range(max_iters):
        # checkpoint the SUPPORT-bearing survivor rows, not just (a, b):
        # at the fixpoint round no edge dropped, so this frame already IS
        # the final answer (support measured in the final subgraph) and
        # the converged round returns it without re-running the whole
        # wedge/triangle join a second time over the identical edge set.
        kept = (
            _edge_support(e).filter(F.col("support") >= k - 2)
            # lazy: the count below is the first action, so one job
            # materializes the round's survivors AND counts them
            .localCheckpoint(eager=False)
        )
        if n_before is None:
            n_before = e.count()
        n_after = kept.count()
        if n_after == n_before:
            return kept
        n_before = n_after
        e = kept.select("a", "b")  # projection over the checkpoint — flat lineage
    raise RuntimeError(f"k_truss did not converge in {max_iters} rounds")


def scc_census(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_pivots: int = 32,
    max_trim_passes: int = 64,
    max_hops: int = 32,
) -> DataFrame:
    """FULL strongly-connected-component labeling — the general case
    of :func:`bowtie_decomposition` (which extracts only the pivot's
    SCC): ``(node, scc_label, scc_size)`` with the canonical label =
    the smallest member id.  The crawl planner's duplicate-cluster map
    for redirect rings and mutually-linked mirror families, and the
    precondition for per-SCC condensation analytics.

    Algorithm (FW-BW with trimming, Fleischer et al. 2000 shape):

    1. TRIM to fixpoint: a node with no in-edge or no out-edge in the
       remaining graph is its own SCC — label and remove.  Each pass
       is two distinct-aggs + anti-joins; web-like graphs (short
       tendrils off a core) trim in a handful of passes.
    2. PIVOT PEEL: pivot = smallest remaining node; its SCC =
       fwd(pivot) ∩ bwd(pivot) via two :func:`seed_distance` delta
       iterations (frontier-sized shuffles, lineage checkpointed);
       label the SCC with its min member, remove it, re-trim.  One
       round per NONTRIVIAL SCC — the Broder bow-tie insight says
       real web graphs concentrate mass in one giant SCC, so rounds
       stay small; ``max_pivots``/``max_trim_passes`` are honest
       safety caps that raise rather than emit a wrong labeling.

    Scale plan per round: bounded ``isEmpty``/1-row probes, hash aggs
    and semi/anti joins only — no windows, no closure materialization
    (the transitive closure lives only in the fixture-scale oracle)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    remaining = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    labels = spark.createDataFrame([], "node long, scc_label long")

    def _trim(rem_nodes, rem_edges):
        nonlocal labels
        for _ in range(max_trim_passes):
            srcs = rem_edges.select(F.col("src").alias("node")).distinct()
            dsts = rem_edges.select(F.col("dst").alias("node")).distinct()
            trivial = (
                rem_nodes.join(srcs, "node", "left_anti")
                .union(rem_nodes.join(dsts, "node", "left_anti"))
                .distinct()
                .localCheckpoint(eager=True)
            )
            if trivial.isEmpty():
                return rem_nodes, rem_edges
            labels = labels.union(
                trivial.select("node", F.col("node").alias("scc_label"))
            ).localCheckpoint(eager=True)
            rem_nodes = rem_nodes.join(
                trivial, "node", "left_anti").localCheckpoint(eager=True)
            rem_edges = (
                rem_edges
                .join(rem_nodes.select(F.col("node").alias("src")),
                      "src", "left_semi")
                .join(rem_nodes.select(F.col("node").alias("dst")),
                      "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
        raise ValueError(f"trim did not converge in {max_trim_passes} passes")

    remaining, e = _trim(remaining, e)
    for _ in range(max_pivots):
        if remaining.isEmpty():
            break
        pivot = remaining.agg(F.min("node").alias("node"))
        fwd = seed_distance(e, pivot, max_hops=max_hops).select("node")
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        bwd = seed_distance(rev, pivot, max_hops=max_hops).select("node")
        scc = fwd.join(bwd, "node", "left_semi").localCheckpoint(eager=True)
        lab = scc.agg(F.min("node").alias("scc_label"))
        labels = labels.union(
            scc.join(F.broadcast(lab)).select("node", "scc_label")
        ).localCheckpoint(eager=True)
        remaining = remaining.join(scc, "node", "left_anti") \
            .localCheckpoint(eager=True)
        e = (
            e.join(remaining.select(F.col("node").alias("src")),
                   "src", "left_semi")
            .join(remaining.select(F.col("node").alias("dst")),
                  "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        remaining, e = _trim(remaining, e)
    else:
        if not remaining.isEmpty():
            raise ValueError(f"more than {max_pivots} nontrivial SCCs")
    sizes = labels.groupBy("scc_label").agg(
        F.count(F.lit(1)).cast("long").alias("scc_size"))
    return labels.join(sizes, "scc_label").select(
        "node", "scc_label", "scc_size")
