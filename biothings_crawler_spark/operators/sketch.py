"""Integer-arithmetic HyperLogLog — a distinct-count sketch whose
ESTIMATE (not just its registers) is cross-engine exact.

Spark's approx_count_distinct and DuckDB's approx HLLs use different
hashes and float harmonic means, so they can never be oracle-paired.
This HLL derives everything from md5 (byte-identical in both engines)
and keeps the harmonic mean in integers:

  * bucket  = first 2 hex chars of md5(value)      (m = 256 registers)
  * rho     = 53 - bitlength(next 13 hex chars)    (leading-zeros+1 of
              a 52-bit suffix; 0 suffix -> capped)
  * register[bucket] = max(rho), capped at RHO_CAP = 30
  * Z       = Σ_buckets 2^(RHO_CAP - register)     -- every term an
              exact power-of-two BIGINT, so the sum COMMUTES (a float
              Σ2^-r rounds order-dependently once exponents spread
              past the 53-bit mantissa)
  * raw     = m * m * 2^RHO_CAP // Z
  * estimate = ALPHA_PPM * raw // 10^6             (α_256 ≈ 0.7123)

Every step is integer floor arithmetic — partial aggregation order
cannot change the answer, and the DuckDB twin (q_hll_distinct)
reproduces it bit for bit. Standard error ~1.04/√256 ≈ 6.5%.

Scale shape: one groupBy(bucket) max-agg (256 groups, map-side
combine does almost all the work) + a 256-row final fold — the
classic sketch shape that turns count-distinct's full shuffle into a
constant-size aggregate.

Small-range correction (Flajolet et al.'s linear counting): when the
raw estimate falls at/below 2.5m (=640) and empty registers remain,
the estimate switches to m·ln(m/V) with V = empty-register count —
the standard HLL regime split. To keep it cross-engine exact, the
256 possible m·ln(m/V) values are PRE-ROUNDED into an integer lookup
table baked into both the Spark expression and the DuckDB twin from
the same Python tuple, so no runtime float/log ever runs in either
engine (pytest asserts exactness-class error at n≈100; the raw
regime is asserted <8% at n=4000).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256
RHO_CAP = 30
ALPHA_PPM = 712300  # alpha_256 = 0.7213/(1 + 1.079/256) ≈ 0.71230
LC_CUTOFF = 5 * HLL_M // 2  # 2.5m — below this, linear counting
# LC_LUT[v-1] = round(m * ln(m / v)) for v empty registers (1-based
# element_at / list_extract in the engines); computed once here and
# serialized as integer literals into BOTH engines' plans
LC_LUT = tuple(round(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1))


def hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value, from md5 — deterministic and
    identical in DuckDB (see SQL twin)."""
    h = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    suffix = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    # bitlength via bin(): '0' -> length 1, so rho caps naturally
    rho = F.least(
        F.when(suffix > 0, F.lit(53) - F.length(F.bin(suffix))).otherwise(F.lit(RHO_CAP)),
        F.lit(RHO_CAP),
    )
    return bucket, rho


def hll_distinct(df: DataFrame, value_col: str) -> DataFrame:
    """One-row DataFrame (estimate BIGINT): the integer-HLL distinct
    count of ``value_col``."""
    bucket, rho = hll_register_cols(F.col(value_col))
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )
    # empty buckets contribute the max term 2^RHO_CAP
    z = regs.agg(
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {RHO_CAP} - r)"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2**RHO_CAP)
        ).alias("z"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("v_empty"),
    )
    raw = F.expr(
        f"{ALPHA_PPM} * ({HLL_M * HLL_M} * cast({2**RHO_CAP} as bigint) div z)"
        " div 1000000"
    ).cast("long")
    lc = F.element_at(
        F.array(*[F.lit(x) for x in LC_LUT]), F.col("v_empty").cast("int")
    ).cast("long")
    return z.select(
        F.when((raw <= LC_CUTOFF) & (F.col("v_empty") > 0), lc)
        .otherwise(raw)
        .alias("estimate")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimates
# for heavy-hitter detection when exact per-key counts won't fit.

CM_D = 4     # hash rows
CM_W = 512   # counters per row; error ≈ e/W of the L1 mass, conservative

_CM_SLICES = [(1 + 8 * i) for i in range(CM_D)]  # disjoint 32-bit md5 slices


def cm_col(value: Column, row: int, w: int = CM_W) -> Column:
    """Counter column for hash row ``row``: a disjoint 32-bit slice of
    md5(value) mod w — independent-enough rows from ONE md5 per value,
    byte-identical in DuckDB."""
    h = F.md5(value.cast("string"))
    s = F.conv(F.substring(h, _CM_SLICES[row], 8), 16, 10).cast("long")
    return F.pmod(s, F.lit(w))


def countmin_build(
    df: DataFrame, value_col: str, d: int = CM_D, w: int = CM_W
) -> DataFrame:
    """Build the sketch as a ``(r, c, n)`` table (≤ d·w rows).

    Scale shape: a d-way row-local explode then ONE hash aggregation
    into at most d·w counters — map-side partials do virtually all the
    work, the shuffle moves ≤ d·w rows per partition regardless of
    input size.  Sketches MERGE by unioning and re-aggregating the
    same (r, c) keys (counts are linear), which is what makes this the
    streaming/segmented alternative to an exact host groupBy.
    """
    v = F.col(value_col)
    pairs = F.array(
        *[F.struct(F.lit(r).alias("r"), cm_col(v, r, w).alias("c")) for r in range(d)]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, value_col: str,
    d: int = CM_D, w: int = CM_W,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: min over the d counters
    each key hashes to.  Guaranteed >= the true count (conservative
    overestimate — collisions only add).  The sketch is ≤ d·w rows, so
    it broadcasts; per key this is d broadcast lookups + one min-agg.
    """
    v = F.col(value_col)
    kk = keys.select(
        v.alias("value"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), cm_col(v, r, w).alias("c"))
                    for r in range(d)
                ]
            )
        ).alias("p"),
    )
    return (
        kk.join(
            F.broadcast(sketch),
            (F.col("p.r") == sketch.r) & (F.col("p.c") == sketch.c),
            "left",
        )
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("estimate"))
    )


# log2-binned latency histogram + quantiles (mergeable, 64-bin bounded)
# ---------------------------------------------------------------------------


def log2_bin_col(value: Column) -> Column:
    """Integer bin ``floor(log2(v))`` for v >= 1 (v <= 0 -> bin 0),
    computed as ``length(bin(v)) - 1`` — exact integer arithmetic, no
    libm, identical in DuckDB (both engines' ``bin()`` render the
    minimal binary string)."""
    v = F.greatest(value.cast("long"), F.lit(1).cast("long"))
    return (F.length(F.bin(v)) - F.lit(1)).cast("long")


def latency_histogram(
    fetches: DataFrame, host_col: str, value_col: str
) -> DataFrame:
    """Per-(host, log2 bin) counts — the mergeable sketch behind
    :func:`host_latency_quantiles`.  At most 64 bins per host
    regardless of fetch volume, so the histogram is a bounded,
    commutative aggregate: shards build partial histograms map-side
    and the shuffle carries (host, bin, count) only.
    """
    return (
        fetches.groupBy(
            F.col(host_col).alias("host"),
            log2_bin_col(F.col(value_col)).alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def host_latency_quantiles(
    fetches: DataFrame,
    host_col: str,
    value_col: str,
    quantiles_ppm: tuple = (500_000, 950_000, 990_000),
) -> DataFrame:
    """Per-host latency quantiles from the log2 histogram:
    ``(host, n, p50_us, p95_us, p99_us, ...)`` where each p-value is
    the UPPER BOUND ``2^(bin+1) - 1`` of the first bin whose running
    count reaches the quantile — a conservative (never understating)
    percentile with at most 2x relative error, which is all a
    politeness controller needs to slow down on a struggling host.

    The reference has no latency plane at all (Scrapy's autothrottle
    keeps a scalar EWMA per slot in driver memory); at 10^10 fetches
    the percentile estimate must be a distributed, mergeable
    aggregate.  Exact-integer everywhere: the 64-bin fold is
    ``aggregate`` over the sorted (bin, n) array, bit-identical in
    the DuckDB list twin.
    """
    hist = latency_histogram(fetches, host_col, value_col)
    per_host = hist.groupBy("host").agg(
        F.sum("n").cast("long").alias("n"),
        F.array_sort(F.collect_list(F.struct("bin", "n"))).alias("bins"),
    )
    bin_cols, labels = [], []
    for q in quantiles_ppm:
        # smallest bin with cum*1e6 >= q*n: fold carries (cum, found_bin)
        fold = F.aggregate(
            F.col("bins"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(-1).cast("long").alias("b"),
            ),
            lambda acc, s: F.struct(
                (acc["cum"] + s["n"]).alias("cum"),
                F.when(
                    (acc["b"] == -1)
                    & ((acc["cum"] + s["n"]) * 1_000_000 >= F.col("n") * q),
                    s["bin"],
                ).otherwise(acc["b"]).alias("b"),
            ),
        )
        label = f"p{q // 10000}_us" if q % 10000 == 0 else f"p{q}ppm_us"
        labels.append(label)
        bin_cols.append(fold["b"].alias(f"_b_{label}"))
    staged = per_host.select("host", "n", *bin_cols)
    # upper bound 2^(b+1) - 1 via integer shift (no libm, no doubles)
    return staged.select(
        "host", "n",
        *[F.expr(f"shiftleft(1L, cast(_b_{l} + 1 AS INT)) - 1L").alias(l)
          for l in labels],
    )


def merge_latency_histograms(*hists: DataFrame) -> DataFrame:
    """Merge per-shard latency histograms: union + one (host, bin)
    hash aggregate.  This IS the sketch's mergeability contract —
    hist(A) ⊕ hist(B) == hist(A ∪ B) exactly (counts add, bins are
    value-determined) — which is what lets each crawl shard keep its
    own histogram and the politeness plane fold them in per round
    without touching raw fetch rows."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("host", "bin").agg(
        F.sum("n").cast("long").alias("n")
    )


def with_hll_estimate(df: DataFrame, regs_col: str, out_col: str = "est") -> DataFrame:
    """df + ``out_col``: the integer-HLL estimate of a REGISTER-ARRAY
    column (array<int>, length HLL_M, 0 = empty register) — the same
    arithmetic as :func:`hll_distinct` (exact power-of-two Z fold, raw
    vs linear-counting regime split via the shared LUT), row-local, so
    it composes with per-node sketches (:func:`hyperball`)."""
    z = F.expr(
        f"aggregate({regs_col}, cast(0 as bigint), "
        f"(a, r) -> a + shiftleft(cast(1 as bigint), {RHO_CAP} - r))"
    )
    v = F.expr(
        f"cast(size(filter({regs_col}, r -> r = 0)) as bigint)"
    )
    raw = F.expr(
        f"cast({ALPHA_PPM} * ({HLL_M * HLL_M} * cast({2 ** RHO_CAP} as bigint)"
        f" div _z) div 1000000 as bigint)"
    )
    lc = F.element_at(
        F.array(*[F.lit(x) for x in LC_LUT]), F.col("_v").cast("int")
    ).cast("long")
    return (
        df.withColumn("_z", z)
        .withColumn("_v", v)
        .withColumn(
            out_col,
            F.when((raw <= LC_CUTOFF) & (F.col("_v") > 0), lc).otherwise(raw),
        )
        .drop("_z", "_v")
    )


def hyperball(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-core computation of fundamental
    centralities with HyperBall", WWW 2013 workshop lineage; the
    HyperANF neighborhood function): per node, an integer-HLL register
    array sketching ball(v, t) = {w : dist(v, w) <= t}; each round
    ball(v, t+1) = ball(v, t) ∪ ⋃_{v→w} ball(w, t), and an HLL union
    is the element-wise MAX of register arrays. Output one row per
    (node, t) with the estimated ball cardinality — the neighborhood
    function that yields effective-diameter / centrality reports a
    crawl planner reads (how many pages are within t hops of the
    seeds; when the frontier will exhaust a site family).

    Exactly reproducible cross-engine: registers derive from md5 and
    the estimate is the integer arithmetic of hll_distinct — so the
    APPROXIMATION ITSELF is oracle-verifiable, not just sanity-bounded.

    Scale shape (the reason HyperBall exists): exact per-node
    reachability is quadratic state, this is at most HLL_M ints per
    node — and the state is kept SPARSE: (node, pos, r) rows for the
    non-empty registers only (every register that exists has r >= 1 by
    construction, so absence encodes zero).  A node's sketch starts as
    ONE row and only grows toward HLL_M as its ball grows, so early
    rounds carry a fraction of the dense payload.  Per round: one
    edges⋈state hash join + ONE (node, pos) max hash agg over three
    integer columns (map-side partials, full codegen — no array
    rebuild, no posexplode row blowup, no struct allocation) —
    Pregel-lite with sketch state, lineage checkpointed per round.
    The estimate arithmetic reads the sparse state directly, exactly
    like :func:`hll_distinct`: empty registers contribute the closed
    form (HLL_M - n_present) * 2^RHO_CAP.
    Edges are materialized once so the caller's plan (typically a
    union+distinct) does not re-execute every round.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    bucket, rho = hll_register_cols(F.col("node"))
    state = nodes.select(
        "node",
        bucket.cast("int").alias("pos"),
        rho.cast("int").alias("r"),
    ).localCheckpoint(eager=True)

    snaps = [state.select("node", F.lit(0).cast("long").alias("t"),
                          "pos", "r")]
    for t in range(1, rounds + 1):
        # name-based join: cross-frame Column refs (e.dst == state.node)
        # lose their exprIds once state is re-created from a checkpoint
        # in later rounds
        contrib = (
            e.withColumnRenamed("dst", "node")
            .join(state, "node")
            .select(F.col("src").alias("node"), "pos", "r")
        )
        state = (
            state.select("node", "pos", "r").unionByName(contrib)
            .groupBy("node", "pos")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
        snaps.append(state.select("node", F.lit(t).cast("long").alias("t"),
                                  "pos", "r"))

    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    zv = out.groupBy("node", "t").agg(
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {RHO_CAP} - r)"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2 ** RHO_CAP)
        ).alias("_z"),
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("_v"),
    )
    raw = F.expr(
        f"cast({ALPHA_PPM} * ({HLL_M * HLL_M} * cast({2 ** RHO_CAP} as bigint)"
        f" div _z) div 1000000 as bigint)"
    )
    lc = F.element_at(
        F.array(*[F.lit(x) for x in LC_LUT]), F.col("_v").cast("int")
    ).cast("long")
    return zv.select(
        "node", "t",
        F.when((raw <= LC_CUTOFF) & (F.col("_v") > 0), lc)
        .otherwise(raw)
        .alias("ball_est"),
    )


def harmonic_centrality(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Harmonic centrality from the HyperBall sketches (Boldi & Vigna,
    "Axioms for centrality" — the application HyperBall was built for):
    H(v) = Σ_{w != v} 1/d(v, w), estimated as
    Σ_t (|ball(v, t)| - |ball(v, t-1)|) * ppm div t in integer
    ppm-units (truncated at the round horizon, the standard HyperBall
    cut). The per-round ball DELTA is clamped at 0: the integer-HLL
    estimate is monotone within a regime but may wobble one unit at
    the linear-counting/raw boundary.

    The crawl reading: harmonic centrality is the seed-quality score —
    how close a page sits to everything else — robust on disconnected
    graphs where closeness centrality degenerates (unreachable nodes
    contribute 0, not infinity).

    Cost on top of :func:`hyperball`: one lag window whose partitions
    hold rounds+1 rows per node (bounded by the constant round count,
    never the graph) + one per-node sum."""
    from pyspark.sql import Window

    balls = hyperball(edges, src_col, dst_col, rounds)
    w = Window.partitionBy("node").orderBy("t")
    d = balls.withColumn("prev", F.lag("ball_est").over(w)).filter(
        F.col("t") > 0
    )
    gain = F.greatest(F.col("ball_est") - F.col("prev"), F.lit(0))
    return (
        d.select("node", F.expr(f"{ppm} div t").alias("w_ppm"), gain.alias("g"))
        .groupBy("node")
        .agg(F.sum(F.col("g") * F.col("w_ppm")).cast("long")
             .alias("harmonic_ppm"))
    )


def effective_diameter(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 3,
    q_ppm: int = 900_000,
) -> DataFrame:
    """Effective diameter from the HyperBall neighborhood function
    (Palmer, Gibbons & Faloutsos, KDD 2002 "ANF"; Boldi & Vigna): the
    smallest hop count t at which the global neighborhood function
    N(t) = Σ_v |ball(v, t)| reaches ``q_ppm`` (default 90%) of its
    value at the round horizon — web graphs famously sit at ~6-8.

    Contract kept integer-exact: N(t) sums the integer-HLL ball
    estimates, frac_ppm = floor(N(t) * 10^6 / N(rounds)) in
    decimal(38,0), ``is_eff`` flags the MINIMAL reached t (the
    interpolated fractional variant trades exactness for polish; a
    crawl planner reads the integer hop).  N(t) is monotone because
    every per-node ball estimate rides monotone register maxima —
    within one estimator regime; the LC/raw boundary can wobble a unit,
    which changes nothing about the minimal-t contract.

    Cost on top of :func:`hyperball`: one t-keyed hash agg (rounds+1
    groups), two 1-row broadcasts.  Output: (t, n_t, frac_ppm,
    is_eff).
    """
    balls = hyperball(edges, src_col, dst_col, rounds)
    nt = balls.groupBy("t").agg(
        F.sum("ball_est").cast("long").alias("n_t"))
    last = nt.filter(F.col("t") == rounds).select(
        F.col("n_t").alias("n_last"))
    frac = nt.crossJoin(F.broadcast(last)).select(
        "t", "n_t",
        F.expr("cast(cast(n_t as decimal(38,0)) * 1000000 div n_last"
               " as bigint)").alias("frac_ppm"),
    )
    eff = frac.filter(F.col("frac_ppm") >= q_ppm).agg(
        F.min("t").alias("t_eff"))
    return frac.crossJoin(F.broadcast(eff)).select(
        "t", "n_t", "frac_ppm",
        (F.col("t") == F.col("t_eff")).cast("long").alias("is_eff"),
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002; Apache DataSketches' theta
# family) — mergeable distinct sketches that, unlike HLL, support SET
# INTERSECTION estimates: "how many distinct URLs do two crawl
# snapshots share" without an exact distinct join.

KMV_K = 256
U60 = 1 << 60


def kmv_sketch(df: DataFrame, value_col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest DISTINCT md5-u60 hash values of ``value_col`` —
    one (h) row each, h < 2^60. Deterministic and parallel-safe: "k
    smallest of a set" is order-free, so any partitioning (and the
    DuckDB twin) produces the identical sketch. If the set has fewer
    than k distinct values the sketch is exact (theta = 2^60).

    Scale shape: one hash-distinct then a k-row TakeOrdered (Spark
    plans orderBy+limit as per-partition top-k + a k-row driver merge
    — no global sort materializes)."""
    from biothings_crawler_spark.operators.sampling import hash_u60_col

    return (
        df.select(hash_u60_col(F.col(value_col), "kmv").alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def _theta_row(sketch: DataFrame, k: int):
    """1-row frame (theta, n_kept): theta = 2^60 in exact mode (fewer
    than k distinct values), else the k-th smallest hash."""
    return sketch.agg(
        F.when(F.count(F.lit(1)) < k, F.lit(U60))
        .otherwise(F.max("h")).cast("long").alias("theta"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )


def theta_overlap(
    a: DataFrame, b: DataFrame, value_col: str, k: int = KMV_K
) -> DataFrame:
    """One-row report estimating distinct |A|, |B|, |A ∩ B| and the
    Jaccard in ppm from two KMV sketches (theta intersection: keep
    sketch values below theta = min(theta_a, theta_b) present in BOTH;
    each survivor stands for 2^60/theta distinct values). All floor
    arithmetic on the shared u60 hash — the ESTIMATOR is cross-engine
    exact, and in exact mode (small sets) it degrades gracefully to
    the true counts.

    Scale: the corpus contributes one distinct + top-k each; the
    intersection math runs on two <= k-row sketches (broadcast join)."""
    sa, sb = kmv_sketch(a, value_col, k), kmv_sketch(b, value_col, k)
    ta = _theta_row(sa, k).select(F.col("theta").alias("ta"),
                                  F.col("n_kept").alias("na"))
    tb = _theta_row(sb, k).select(F.col("theta").alias("tb"),
                                  F.col("n_kept").alias("nb"))
    inter = sa.join(sb, "h", "inner")
    t = ta.join(tb)
    n_inter = (
        inter.join(F.broadcast(t))
        .where(F.col("h") < F.least("ta", "tb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    est = t.join(n_inter)
    # KMV estimator: (k-1) * 2^60 div theta when saturated, else exact.
    # numerators reach 2^68 — they go through DECIMAL(38,0) (HUGEINT in
    # the DuckDB twin) and floor-div back to BIGINT
    a_est = F.when(F.col("ta") == U60, F.col("na")).otherwise(
        F.expr(f"cast(cast({k - 1} as decimal(38,0)) * {U60} div ta"
               " as bigint)"))
    b_est = F.when(F.col("tb") == U60, F.col("nb")).otherwise(
        F.expr(f"cast(cast({k - 1} as decimal(38,0)) * {U60} div tb"
               " as bigint)"))
    i_est = F.expr(
        f"cast(cast(n_common as decimal(38,0)) * {U60} div least(ta, tb)"
        " as bigint)")
    out = est.select(
        a_est.cast("long").alias("a_est"),
        b_est.cast("long").alias("b_est"),
        i_est.alias("inter_est"),
    ).withColumn("u_est", F.col("a_est") + F.col("b_est") - F.col("inter_est"))
    return out.select(
        "a_est", "b_est", "inter_est",
        F.when(
            F.col("u_est") > 0,
            F.expr("cast(cast(inter_est as decimal(38,0)) * 1000000"
                   " div u_est as bigint)"),
        ).otherwise(F.lit(0)).cast("long").alias("jaccard_ppm"),
    )


def host_content_sketches(
    df: DataFrame, host_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-host bottom-k content sketch: the k smallest distinct u60
    hashes of ``value_col`` per host — one KMV sketch per host in a
    single relation, the input to sketch-space host similarity.

    The per-host top-k runs TWO-PHASE (rank within (host, salt)
    buckets, keep k per bucket, then rank the <= 16k survivors per
    host) — the politeness-window trick, because a naive
    row_number().over(partitionBy(host)) hands a hot host's entire
    distinct-content set to one task. Phase-1 cannot lose a true
    bottom-k member (k kept per bucket)."""
    from pyspark.sql import Window

    from biothings_crawler_spark.operators.sampling import hash_u60_col

    base = (
        df.select(F.col(host_col).alias("host"),
                  hash_u60_col(F.col(value_col), "kmv").alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .withColumn("salt", F.pmod(F.col("h"), F.lit(16)))
    )
    w1 = Window.partitionBy("host", "salt").orderBy("h")
    p1 = (
        base.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .drop("r1", "salt")
    )
    w2 = Window.partitionBy("host").orderBy("h")
    return (
        p1.withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= k)
        .drop("r2")
    )


def host_overlap_pairs(
    sketches: DataFrame, k: int = 64, min_jaccard_ppm: int = 100_000
) -> DataFrame:
    """Sketch-space host similarity: join the per-host bottom-k
    sketches on the hash value (candidate pairs = hosts SHARING a
    sketch member — hosts with no common content never pair, so the
    shuffle carries sketch rows, never a host x host product), then
    the theta estimator per pair. The content-based sibling of the
    exact-digest mirror detector (operators/traps.mirror_report):
    catches near-mirrors whose page SETS overlap heavily even when no
    URL pairing is known, at k rows per host instead of per-page
    state.

    Emits (host_a, host_b, a_est, b_est, inter_est, jaccard_ppm) for
    pairs at/above ``min_jaccard_ppm``."""
    th = sketches.groupBy("host").agg(
        F.when(F.count(F.lit(1)) < k, F.lit(U60))
        .otherwise(F.max("h")).cast("long").alias("theta"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    a = sketches.select(F.col("host").alias("host_a"), "h")
    b = sketches.select(F.col("host").alias("host_b"), "h")
    common = (
        a.join(b, "h")
        .where(F.col("host_a") < F.col("host_b"))
        .join(F.broadcast(th.select(F.col("host").alias("host_a"),
                                    F.col("theta").alias("ta"),
                                    F.col("n_kept").alias("na"))), "host_a")
        .join(F.broadcast(th.select(F.col("host").alias("host_b"),
                                    F.col("theta").alias("tb"),
                                    F.col("n_kept").alias("nb"))), "host_b")
        .where(F.col("h") < F.least("ta", "tb"))
        .groupBy("host_a", "host_b", "ta", "na", "tb", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    a_est = F.when(F.col("ta") == U60, F.col("na")).otherwise(
        F.expr(f"cast(cast({k - 1} as decimal(38,0)) * {U60} div ta"
               " as bigint)"))
    b_est = F.when(F.col("tb") == U60, F.col("nb")).otherwise(
        F.expr(f"cast(cast({k - 1} as decimal(38,0)) * {U60} div tb"
               " as bigint)"))
    i_est = F.expr(
        f"cast(cast(n_common as decimal(38,0)) * {U60} div least(ta, tb)"
        " as bigint)")
    out = common.select(
        "host_a", "host_b",
        a_est.cast("long").alias("a_est"),
        b_est.cast("long").alias("b_est"),
        i_est.alias("inter_est"),
    ).withColumn("u_est", F.col("a_est") + F.col("b_est") - F.col("inter_est"))
    return (
        out.withColumn(
            "jaccard_ppm",
            F.when(
                F.col("u_est") > 0,
                F.expr("cast(cast(inter_est as decimal(38,0)) * 1000000"
                       " div u_est as bigint)"),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .drop("u_est")
        .filter(F.col("jaccard_ppm") >= min_jaccard_ppm)
    )


def hll_distinct_by(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group integer-HLL distinct estimates — the host-size census
    (distinct URLs per host) at 10^10 rows without a per-host exact
    distinct: state is <= HLL_M registers PER GROUP, so the shuffle
    carries at most |groups| x 256 rows whatever the input size.

    Shape: one (group, bucket) max-agg (map-side partials eat the
    duplicates), one bounded per-group register-array rebuild, then
    the same row-local integer estimate as :func:`hll_distinct`
    (raw/linear-counting regime split included) via
    :func:`with_hll_estimate`. Output: (group, estimate)."""
    bucket, rho = hll_register_cols(F.col(value_col))
    regs = (
        df.select(F.col(group_col).alias("grp"),
                  bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    packed = regs.groupBy("grp").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(HLL_M - 1)),
            lambda j: F.coalesce(
                F.element_at(
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("bucket"), F.col("r")))
                    ),
                    j.cast("bigint"),
                ),
                F.lit(0),
            ).cast("int"),
        ).alias("regs")
    )
    return with_hll_estimate(packed, "regs", "estimate").select(
        F.col("grp").alias(group_col), F.col("estimate").cast("long")
        .alias("estimate")
    )
