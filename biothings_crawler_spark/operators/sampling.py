"""Deterministic mixture sampling for training-data composition: keep
each document with a per-stratum probability (the "data mixing" step
that turns a raw web corpus into a weighted pretraining mix — e.g.
upsample curated sources, downsample generic crawl).

Two deliberate design points for 100 TB:

* **Zero shuffle.** The keep/drop decision is a pure row-local
  predicate — a 60-bit md5 hash of (seed, id) compared against a
  per-stratum integer threshold. No sort, no window, no exchange;
  the filter rides the scan. (Count-exact per-stratum top-k, when
  needed, is already the politeness operator: select_politely's
  two-phase salted window IS a stratified-k sampler.)
* **Cross-engine exact.** Engine RNGs aren't portable; md5 is.
  u = int(md5(seed:id)[:15], 16) is uniform on [0, 2^60) and
  byte-identical in Spark and DuckDB, so sampling decisions — not
  just sample sizes — are oracle-verifiable (q_mixture_sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

U60_MAX = 1 << 60


def hash_u60_col(id_col: Column, seed: str) -> Column:
    """Deterministic uniform BIGINT on [0, 2^60): the first 15 hex
    chars of md5(seed:id). Matches DuckDB's
    ('0x' || substr(md5(seed || ':' || id), 1, 15))::BIGINT — including
    for NULL ids: concat (not concat_ws) propagates the NULL, so a
    null-id row hashes to NULL, fails every threshold comparison, and
    is dropped on both engines (concat_ws would silently collapse all
    null ids onto the single hash md5(seed), keeping or dropping them
    en masse)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def rate_threshold(rate: float) -> int:
    """Integer keep-threshold for a [0,1] rate — compare u60 < this."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * U60_MAX)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s]
    (deterministic in (seed, id); strata missing from ``rates`` use
    ``default_rate``). Returns the surviving rows unchanged."""
    u = hash_u60_col(F.col(id_col), seed)
    thr: Column = F.lit(rate_threshold(default_rate))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(rate_threshold(r))).otherwise(thr)
    return df.filter(u < thr)


def quality_weighted_sample(
    df: DataFrame,
    id_col: str,
    score_ppm_col: str,
    base_rate: float = 1.0,
    seed: str = "qw",
) -> DataFrame:
    """Keep each row with probability ``base_rate * score_ppm/1e6`` —
    quality-PROPORTIONAL sampling (the soft alternative to a hard
    quality cutoff: high-quality documents are kept almost always, the
    tail keeps a diversity residue instead of vanishing).  Fully
    deterministic in (seed, id): keep iff
    ``u60(id) * 1_000_000 < score_ppm * threshold(base_rate)`` — exact
    integer comparison (u60 < 2^60, score_ppm <= 1e6, the product
    fits a 128-bit DECIMAL), zero shuffle, reproducible across runs
    and cluster widths.
    """
    u = hash_u60_col(F.col(id_col), seed)
    thr = rate_threshold(base_rate)
    keep = (
        u.cast("decimal(38,0)") * F.lit(1_000_000)
        < F.col(score_ppm_col).cast("decimal(38,0)") * F.lit(thr)
    )
    return df.filter(keep)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_ppm_col: str,
    k: int,
    seed: str = "pri",
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement by priority
    sampling (Duffield, Lund & Thorup, JACM 2007): each row gets
    priority q = w / u with u uniform on (0, 1], the sample is the
    top-k by q, and every sampled row's unbiased weight estimate is
    ``max(w, tau)`` with tau the (k+1)-th priority — so
    ``sum(est_w_ppm)`` over the sample estimates the population's
    total weight (the property subset-sum queries at 100 TB lean on).

    Everything integer-exact, long-only, deterministic in (seed, id):
    u = (u60(id) div 2^30) + 1 is uniform on [1, 2^30] and the
    priority is the floored rational ``w_ppm * 2^30 div u`` — in
    w-ppm units (q >= w always), so tau compares directly with
    weights; ``w_ppm * 2^30`` requires w_ppm < 2^33.  Ties break by
    id.  The top-(k+1) is a TakeOrderedAndProject (per-partition
    heaps, a (k+1)-row merge — never a global sort); tau rides back
    as a 1-row broadcast.

    Output: (id, w_ppm, priority, est_w_ppm) — exactly k rows when
    the input has more than k, all rows (est = w, tau = 0) otherwise.
    """
    two30 = 1 << 30
    u = hash_u60_col(F.col(id_col), seed)
    pri = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_ppm_col).cast("long").alias("w_ppm"),
        u.alias("_u"),
    ).select(
        "id", "w_ppm",
        F.expr(f"(w_ppm * {two30}L) div ((_u div {two30}L) + 1L)")
        .cast("long").alias("priority"),
    )
    top = pri.orderBy(F.desc("priority"), "id").limit(k + 1)
    tau = top.agg(
        F.when(F.count(F.lit(1)) > k, F.min("priority"))
        .otherwise(F.lit(0)).cast("long").alias("tau"))
    return (
        top.orderBy(F.desc("priority"), "id").limit(k)
        .crossJoin(F.broadcast(tau))
        .select(
            "id", "w_ppm", "priority",
            F.greatest("w_ppm", "tau").cast("long").alias("est_w_ppm"),
        )
    )


def select_token_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    score_ppm_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Greedy quality-first corpus selection under a TOKEN budget: take
    documents in descending quality order until ``budget_tokens`` is
    spent (the selection step of every "train on the best N tokens"
    recipe).  Naively this is a global sort + running-sum window — one
    task owns the whole corpus.  Scale shape instead:

      1. per-SCORE totals: one hash agg onto at most 1e6+1 integer
         ppm bands;
      2. running sum over the BAND table (a window over <= 1e6 rows —
         bounded by the score domain, not the corpus);
      3. bands strictly above the cutoff broadcast back as
         take-everything; only the single BOUNDARY band runs a
         per-document running-sum window, ordered by ``id`` — bounded
         by one band's population (fine-grained scores keep it small;
         a degenerate all-one-score corpus degrades to the naive sort,
         which is the problem's true lower bound).

    Deterministic: (score desc, id asc) total order.  Returns the
    selected rows plus ``cum_tokens`` (the running total INCLUDING the
    row).  A document that would overflow the budget is excluded
    (strict knapsack-prefix semantics).
    """
    b = int(budget_tokens)
    bands = (
        df.groupBy(F.col(score_ppm_col).alias("band"))
        .agg(F.sum(F.col(tokens_col)).cast("long").alias("band_tokens"))
    )
    wb = Window.orderBy(F.col("band").desc())
    banded = bands.select(
        "band", "band_tokens",
        F.sum("band_tokens").over(wb).alias("cum_through_band"),
    )
    # bands fully inside the budget; the first band that crosses is
    # the boundary (processed per-document below)
    full = banded.filter(F.col("cum_through_band") <= b).select(
        "band", F.lit(False).alias("is_boundary"),
        (F.col("cum_through_band") - F.col("band_tokens")).alias("tokens_before"),
    )
    boundary = (
        banded.filter(
            (F.col("cum_through_band") > b)
            & (F.col("cum_through_band") - F.col("band_tokens") < b)
        )
        .select(
            "band", F.lit(True).alias("is_boundary"),
            (F.col("cum_through_band") - F.col("band_tokens")).alias("tokens_before"),
        )
    )
    plan = full.unionByName(boundary)
    joined = df.join(
        F.broadcast(plan), df[score_ppm_col] == plan.band, "inner"
    )
    inside = joined.filter(~F.col("is_boundary")).select(
        *df.columns, (F.col("tokens_before")).alias("_before"),
    )
    edge = (
        joined.filter(F.col("is_boundary"))
        .select(*df.columns, "tokens_before")
        .withColumn("_run", F.sum(F.col(tokens_col)).over(
            Window.orderBy(F.col(id_col))))
        .filter(F.col("tokens_before") + F.col("_run") <= b)
        .select(*df.columns, (F.col("tokens_before")).alias("_before"))
    )
    # exact per-row cumulative position: within-band running sum added
    # to the band's prefix (full bands order by id for determinism)
    wfull = Window.partitionBy(F.col(score_ppm_col)).orderBy(F.col(id_col))
    out = inside.withColumn(
        "cum_tokens", F.col("_before") + F.sum(F.col(tokens_col)).over(wfull)
    ).unionByName(
        edge.withColumn(
            "cum_tokens", F.col("_before") + F.sum(F.col(tokens_col)).over(wfull)
        )
    )
    return out.drop("_before")


def leakage_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "id",
    train_rate: float = 0.98,
    val_rate: float = 0.01,
    seed: str = "split1",
) -> DataFrame:
    """Deterministic train/val/test assignment that cannot leak
    near-duplicates across splits: every doc is hashed by its dedup
    CLUSTER representative (connected-component id from the near-dup
    pair graph; singletons by their own id), so all members of a
    near-dup cluster — the pairs that make eval contamination — land in
    the SAME split by construction, not by a post-hoc check.  The split
    decision is the mixture-sampling primitive (md5-u60 threshold,
    cross-engine exact, zero shuffle once components are joined).

    Returns ``(id, component, split)``."""
    rep = (
        docs.select(F.col(id_col).alias("id"))
        .join(clusters.select("id", "component"), "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )
    u = hash_u60_col(F.col("component"), seed)
    t_train = rate_threshold(train_rate)
    t_val = rate_threshold(train_rate + val_rate)
    return rep.select(
        "id",
        "component",
        F.when(u < t_train, F.lit("train"))
        .when(u < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def temperature_mix(
    counts: DataFrame,
    temperature: int = 2,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled mixture weighting (the multilingual sampling
    rule of XLM/mT5-class pipelines): given per-stratum token counts
    ``(stratum, tokens)``, reweight each stratum proportionally to
    ``tokens^(1/T)`` — T=1 is proportional (head languages dominate),
    larger T flattens the mixture toward uniform so tail languages are
    up-sampled.  Returns ``(stratum, tokens, weight, share_ppm[,
    quota])`` with ``quota`` the stratum's slice of ``budget`` tokens.

    Exact integers: the T-th root is a truncated-double seed corrected
    by integer comparison (r^T <= x < (r+1)^T — the bandit module's
    isqrt trick generalized), applied to ``tokens`` pre-scaled by
    10^6 (T=1), 10^8 (T=2), 10^9 (T=3), 10^8 (T=4), so weights carry
    ~6 root digits for T=1 and ~4/~3/~2 for T=2/3/4, and both engines
    land on identical shares.  Supported T: 1..4.  The pre-scale bounds
    the per-stratum token count: tokens*scale must fit int64, i.e.
    ~9.2e12 tokens for T=1 and ~9.2e10 for T=2 (an earlier 10^12
    scale for T=2 overflowed past 9.2e6 tokens — trivially reached by
    any real language in a multilingual corpus).

    Shape: strata are bounded by construction (languages, sources) —
    one hash agg upstream produces ``counts``; everything here is a
    broadcast-sized projection + one single-row totals join."""
    t = int(temperature)
    if t not in (1, 2, 3, 4):
        raise ValueError(f"temperature must be 1..4, got {t}")
    scale = {1: 10**6, 2: 10**8, 3: 10**9, 4: 10**8}[t]
    pow_r = " * ".join(["_r"] * t)
    pow_r1 = " * ".join(["(_r + 1)"] * t)
    pow_rm = " * ".join(["(_r - 1)"] * t)
    staged = (
        counts.selectExpr("stratum", "CAST(tokens AS BIGINT) AS tokens")
        .withColumn("_x", F.expr(f"tokens * {scale}L"))
        .withColumn(
            "_r",
            F.expr(f"cast(pow(cast(_x as double), 1.0d / {t}) as bigint)"),
        )
        .withColumn(
            "weight",
            F.expr(
                f"CASE WHEN {pow_r1} <= _x THEN _r + 1 "
                f"WHEN {pow_r} > _x THEN "
                f"  CASE WHEN _r >= 1 AND {pow_rm} <= _x THEN _r - 1 "
                f"       ELSE _r END "
                f"ELSE _r END"
            ).cast("long"),
        )
        .drop("_x", "_r")
    )
    tot = staged.agg(F.sum("weight").cast("long").alias("_w_total"))
    out = staged.crossJoin(F.broadcast(tot)).selectExpr(
        "stratum", "tokens", "weight",
        "weight * 1000000 div _w_total AS share_ppm",
        "_w_total",
    )
    if budget is not None:
        out = out.selectExpr(
            "stratum", "tokens", "weight", "share_ppm",
            f"CAST({int(budget)} AS BIGINT) * weight div _w_total AS quota",
        )
    else:
        out = out.drop("_w_total")
    return out


DEFAULT_EPOCH_DECAY_PPM = (1_000_000, 880_000, 700_000, 450_000, 180_000)


def allocate_epochs(
    src_tokens: DataFrame,
    budget: int,
    decay_ppm: tuple = DEFAULT_EPOCH_DECAY_PPM,
) -> DataFrame:
    """Data-constrained epoch allocation (after Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models": repeating data is worth
    progressively less — roughly full value through the first few
    epochs, then sharply decaying).  Given per-source unique-token
    counts and a total training-token budget larger than the unique
    pool, decide how many (possibly fractional) repeat epochs of each
    source to take.

    The marginal value of epoch ``e`` of ANY source is ``decay_ppm[e-1]``
    per token, so the greedy optimum is a pure threshold rule: order
    candidate (source, epoch) units by (value desc, tokens desc, source)
    and take whole units while the running token sum fits, one partial
    unit at the boundary, nothing after.  ``utility`` is the exact
    integer ``tokens_used * value_ppm div 10^6``.

    Scale shape: ``src_tokens`` is already an aggregation output — one
    row per source, a BOUNDED dimension table (languages / corpus
    sources number in the hundreds, never corpus-sized) — so the
    unpartitioned running-sum window over ``|sources| * |epochs|`` rows
    is a driver-bounded plan by construction, the q_token_budget
    boundary-band precedent.  The corpus itself is touched only by the
    upstream per-source count, one map-side-combine hash agg."""
    n_ep = len(decay_ppm)
    decay_arr = F.array(*[F.lit(int(v)) for v in decay_ppm])
    cand = (
        src_tokens.selectExpr("source", "CAST(tokens AS BIGINT) AS tokens")
        .withColumn("epoch", F.explode(F.array(
            *[F.lit(e) for e in range(1, n_ep + 1)])))
        .withColumn("value_ppm",
                    F.element_at(decay_arr, F.col("epoch")).cast("long"))
        .withColumn("epoch", F.col("epoch").cast("long"))
    )
    w = Window.orderBy(F.desc("value_ppm"), F.desc("tokens"), F.asc("source"))
    alloc = (
        cand
        .withColumn("_cum", F.sum("tokens").over(w).cast("long"))
        .withColumn("_before", (F.col("_cum") - F.col("tokens")).cast("long"))
        .withColumn(
            "tokens_used",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("tokens"),
                        F.lit(int(budget)).cast("long") - F.col("_before")),
            ),
        )
        .withColumn(
            "status",
            F.when(F.col("tokens_used") == F.col("tokens"), F.lit("full"))
            .when(F.col("tokens_used") > 0, F.lit("partial"))
            .otherwise(F.lit("cut")),
        )
        .withColumn(
            "utility",
            F.expr("tokens_used * value_ppm div 1000000").cast("long"),
        )
    )
    return alloc.select("source", "epoch", "tokens", "value_ppm",
                        "tokens_used", "utility", "status")
