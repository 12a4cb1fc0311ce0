"""HyperBall neighborhood function (operators/sketch.hyperball)."""

from biothings_crawler_spark.operators.sketch import hyperball


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _balls(spark, pairs, rounds):
    out = hyperball(_edges(spark, pairs), rounds=rounds).collect()
    return {(r["node"], r["t"]): r["ball_est"] for r in out}


def test_chain_ball_growth_and_saturation(spark):
    # 0 -> 1 -> 2 -> 3: ball(0, t) = {0..t}; estimates in the
    # linear-counting regime are within ±1 of truth at these sizes
    got = _balls(spark, [(0, 1), (1, 2), (2, 3)], rounds=4)
    for t in range(5):
        truth = min(t + 1, 4)
        assert abs(got[(0, t)] - truth) <= 1, (t, got[(0, t)])
    # saturated: ball stops growing once t >= eccentricity
    assert got[(0, 4)] == got[(0, 3)]


def test_ball_estimates_monotone_in_t(spark):
    pairs = [(i, (i * 3) % 11) for i in range(11) if i != (i * 3) % 11]
    got = _balls(spark, pairs, rounds=3)
    nodes = {n for n, _ in got}
    for n in nodes:
        seq = [got[(n, t)] for t in range(4)]
        assert seq == sorted(seq), (n, seq)


def test_sink_ball_stays_singleton(spark):
    got = _balls(spark, [(0, 1), (2, 1)], rounds=2)
    # node 1 has no out-edges: its ball is always just itself
    assert got[(1, 0)] == got[(1, 1)] == got[(1, 2)]
    assert 1 <= got[(1, 0)] <= 2


def test_harmonic_centrality_star_center_wins(spark):
    from biothings_crawler_spark.operators.sketch import harmonic_centrality

    # center 0 reaches all leaves at distance 1; leaves reach nothing
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    got = {r["node"]: r["harmonic_ppm"]
           for r in harmonic_centrality(e, rounds=2).collect()}
    assert got[0] == max(got.values())
    assert all(got[i] == 0 for i in range(1, 6))


def test_harmonic_centrality_chain_decay(spark):
    from biothings_crawler_spark.operators.sketch import harmonic_centrality

    # 0 -> 1 -> 2 -> 3: H(0) > H(1) > H(2) > H(3) = 0 (within the
    # ±1-unit sketch error the strict chain ordering still holds here)
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r["node"]: r["harmonic_ppm"]
           for r in harmonic_centrality(e, rounds=3).collect()}
    assert got[0] > got[1] > got[2] > got[3] == 0


# --- KMV / theta sketch set operations ------------------------------------


def _urls(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "url string")


def test_theta_exact_mode_small_sets(spark):
    from biothings_crawler_spark.operators.sketch import theta_overlap

    a = _urls(spark, [f"u{i}" for i in range(40)])
    b = _urls(spark, [f"u{i}" for i in range(20, 60)])
    r = theta_overlap(a, b, "url").collect()[0]
    # both below k=256: sketches are exact, estimator returns truth
    assert (r["a_est"], r["b_est"], r["inter_est"]) == (40, 40, 20)
    assert r["jaccard_ppm"] == 20 * 1_000_000 // 60


def test_theta_saturated_estimates_near_truth(spark):
    from biothings_crawler_spark.operators.sketch import theta_overlap

    # |A| = |B| = 2000, |A ∩ B| = 1000, J = 1/3; k = 256 sketches
    a = _urls(spark, [f"u{i}" for i in range(2000)])
    b = _urls(spark, [f"u{i}" for i in range(1000, 3000)])
    r = theta_overlap(a, b, "url").collect()[0]
    assert abs(r["a_est"] - 2000) <= 300
    assert abs(r["b_est"] - 2000) <= 300
    assert abs(r["inter_est"] - 1000) <= 300
    assert abs(r["jaccard_ppm"] - 333_333) <= 120_000


def test_theta_disjoint_sets(spark):
    from biothings_crawler_spark.operators.sketch import theta_overlap

    a = _urls(spark, [f"a{i}" for i in range(500)])
    b = _urls(spark, [f"b{i}" for i in range(500)])
    r = theta_overlap(a, b, "url").collect()[0]
    assert r["inter_est"] == 0 and r["jaccard_ppm"] == 0


# --- per-host bottom-k sketches + sketch-space host overlap ----------------


def _host_pages(spark, rows):
    return spark.createDataFrame(rows, "host string, page string")


def test_host_sketch_is_true_bottom_k(spark):
    from biothings_crawler_spark.operators.sampling import hash_u60_col
    from biothings_crawler_spark.operators.sketch import (
        host_content_sketches,
    )
    from pyspark.sql import functions as F

    rows = [("a", f"p{i}") for i in range(200)]
    got = sorted(
        r["h"] for r in
        host_content_sketches(_host_pages(spark, rows), "host", "page",
                              k=16).collect()
    )
    truth = sorted(
        r["h"] for r in
        _host_pages(spark, rows)
        .select(hash_u60_col(F.col("page"), "kmv").alias("h")).collect()
    )[:16]
    assert got == truth  # two-phase == global bottom-k, exactly


def test_host_overlap_exact_mode(spark):
    from biothings_crawler_spark.operators.sketch import (
        host_content_sketches,
        host_overlap_pairs,
    )

    rows = ([("a", f"p{i}") for i in range(40)]
            + [("b", f"p{i}") for i in range(20, 60)]
            + [("c", f"x{i}") for i in range(30)])  # disjoint content
    sk = host_content_sketches(_host_pages(spark, rows), "host", "page", k=64)
    got = {(r["host_a"], r["host_b"]): r
           for r in host_overlap_pairs(sk, k=64, min_jaccard_ppm=0).collect()}
    r = got[("a", "b")]
    assert (r["a_est"], r["b_est"], r["inter_est"]) == (40, 40, 20)
    assert r["jaccard_ppm"] == 20 * 1_000_000 // 60
    # hosts sharing nothing never even become a candidate pair
    assert not any("c" in pair for pair in got)


def test_host_overlap_saturated_near_truth(spark):
    from biothings_crawler_spark.operators.sketch import (
        host_content_sketches,
        host_overlap_pairs,
    )

    rows = ([("a", f"p{i}") for i in range(2000)]
            + [("b", f"p{i}") for i in range(1000, 3000)])
    sk = host_content_sketches(_host_pages(spark, rows), "host", "page",
                               k=256)
    r = host_overlap_pairs(sk, k=256, min_jaccard_ppm=0).collect()[0]
    assert abs(r["a_est"] - 2000) <= 300
    assert abs(r["inter_est"] - 1000) <= 350
    assert abs(r["jaccard_ppm"] - 333_333) <= 130_000


def test_hll_by_host_accuracy_and_merge_with_global(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.sketch import (
        hll_distinct,
        hll_distinct_by,
    )

    # three hosts with known distinct counts (50 / 120 / 700)
    rows = ([("a", f"u{i % 50}") for i in range(400)]
            + [("b", f"u{i % 120}") for i in range(400)]
            + [("c", f"w{i}") for i in range(700)])
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["host"]: r["estimate"]
           for r in hll_distinct_by(df, "host", "url").collect()}
    for host, truth in (("a", 50), ("b", 120), ("c", 700)):
        assert abs(got[host] - truth) <= max(3, truth * 0.12), (host, got)
    # the per-host sketch of a single-host frame equals the global one
    only_a = df.filter(F.col("host") == "a")
    g = hll_distinct(only_a, "url").collect()[0]["estimate"]
    assert got["a"] == g


def test_effective_diameter_path_graph(spark):
    from biothings_crawler_spark.operators.sketch import effective_diameter

    # directed path 0->1->...->7, 4 rounds: balls grow by one hop per
    # round; minimal t with N(t) >= 0.9 * N(4) must flag exactly once
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src long, dst long")
    rows = effective_diameter(e, rounds=4).collect()
    assert len(rows) == 5
    by_t = {r.t: r for r in rows}
    # monotone N(t), frac hits 1e6 at the horizon
    ns = [by_t[t].n_t for t in range(5)]
    assert ns == sorted(ns)
    assert by_t[4].frac_ppm == 1_000_000
    eff = [r.t for r in rows if r.is_eff == 1]
    assert len(eff) == 1
    # the flagged t is the minimal one at >= 900000
    t_eff = eff[0]
    assert by_t[t_eff].frac_ppm >= 900_000
    assert all(by_t[t].frac_ppm < 900_000 for t in range(t_eff))
