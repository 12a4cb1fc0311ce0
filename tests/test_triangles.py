"""Triangle counting via degree-ordered orientation."""

from itertools import combinations

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.pagerank import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k5_clique(spark):
    got = {r.node: r.triangles for r in triangle_counts(
        _edges(spark, list(combinations(range(5), 2)))).collect()}
    assert got == {n: 6 for n in range(5)}  # C(4,2) per node


def test_star_has_no_triangles(spark):
    got = triangle_counts(_edges(spark, [(0, i) for i in range(1, 30)]))
    assert got.count() == 0


def test_duplicate_and_reversed_edges_collapse(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    noisy = tri + [(b, a) for a, b in tri] + tri
    got = {r.node: r.triangles
           for r in triangle_counts(_edges(spark, noisy)).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_clique_plus_pendant(spark):
    pairs = list(combinations(range(4), 2)) + [(0, 99)]
    got = {r.node: r.triangles
           for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # pendant node absent


def test_related_hosts_path_graph(spark):
    from biothings_crawler_spark.operators.pagerank import related_hosts

    # path 1-2-3-4: non-adjacent pairs (1,3),(2,4) share one middle
    # node of degree 2 -> 500000 ppm; (1,4) shares none.
    got = {(r.x, r.y): (r.ra_ppm, r.common_neighbors)
           for r in related_hosts(
               _edges(spark, [(1, 2), (2, 3), (3, 4)]), k=10).collect()}
    assert got == {(1, 3): (500000, 1), (2, 4): (500000, 1)}


def test_related_hosts_excludes_adjacent(spark):
    from biothings_crawler_spark.operators.pagerank import related_hosts

    # triangle: every pair adjacent -> no candidates at all
    got = related_hosts(_edges(spark, [(1, 2), (2, 3), (1, 3)]), k=10)
    assert got.count() == 0


def test_k_core_peels_to_clique(spark):
    from itertools import combinations

    from biothings_crawler_spark.operators.pagerank import k_core

    # a K5 clique with pendant chains: chains peel away over rounds,
    # clique survives with internal degree 4
    pairs = list(combinations(range(5), 2))
    pairs += [(0, 10), (10, 11), (11, 12), (1, 20), (20, 21)]
    got = {r.node: r.core_deg for r in k_core(_edges(spark, pairs), 4).collect()}
    assert got == {n: 4 for n in range(5)}


def test_k_core_empty_when_no_core(spark):
    from biothings_crawler_spark.operators.pagerank import k_core

    # a path graph has no 2-core
    got = k_core(_edges(spark, [(i, i + 1) for i in range(8)]), 2)
    assert got.count() == 0


def test_clustering_coefficient_hand_computed(spark):
    from biothings_crawler_spark.operators.pagerank import (
        clustering_coefficients,
    )

    # K4 clique (C=1) + a pendant off node 0 + an isolated-ish edge
    pairs = list(combinations(range(4), 2)) + [(0, 99), (50, 51)]
    got = {r.node: (r.deg, r.triangles, r.lcc_ppm)
           for r in clustering_coefficients(_edges(spark, pairs)).collect()}
    # inner clique nodes 1-3: deg 3, 3 triangles, C = 6/(3*2) = 1
    for n in (1, 2, 3):
        assert got[n] == (3, 3, 1_000_000)
    # node 0: deg 4 (clique + pendant), still 3 triangles:
    # C = 6/(4*3) = 0.5
    assert got[0] == (4, 3, 500_000)
    # degree-1 nodes (pendant 99, edge 50-51) are excluded: undefined C
    assert 99 not in got and 50 not in got and 51 not in got


def test_clustering_coefficient_open_wedge_floor(spark):
    from biothings_crawler_spark.operators.pagerank import (
        clustering_coefficients,
    )

    # path 1-2-3 plus 2-4: node 2 has deg 3, zero triangles -> 0 ppm;
    # triangle 5-6-7 with extra edge 5-8: node 5 deg 3, 1 triangle ->
    # floor(2e6/6) = 333333 (exercises the non-trivial floor)
    pairs = [(1, 2), (2, 3), (2, 4), (5, 6), (6, 7), (5, 7), (5, 8)]
    got = {r.node: (r.deg, r.triangles, r.lcc_ppm)
           for r in clustering_coefficients(_edges(spark, pairs)).collect()}
    assert got[2] == (3, 0, 0)
    assert got[5] == (3, 1, 333_333)
    assert got[6] == (2, 1, 1_000_000)


def test_assortativity_star_is_maximally_disassortative(spark):
    from biothings_crawler_spark.operators.pagerank import (
        degree_assortativity,
    )

    # star: hub deg n, leaves deg 1 -> r = -1 exactly
    got = degree_assortativity(
        _edges(spark, [(0, i) for i in range(1, 6)])).collect()[0]
    assert got.r_ppm == -1_000_000
    # sufficient stats: m2=10, each edge contributes (5,1) and (1,5)
    assert (got.m2, got.sxy, got.sx, got.sxx) == (10, 50, 30, 130)


def test_assortativity_regular_graph_zero_variance(spark):
    from biothings_crawler_spark.operators.pagerank import (
        degree_assortativity,
    )

    # 4-cycle: every node deg 2 -> zero variance, defined r_ppm = 0
    got = degree_assortativity(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])).collect()[0]
    assert got.r_ppm == 0


def test_assortative_clique_pair_matches_python(spark):
    from biothings_crawler_spark.operators.pagerank import (
        degree_assortativity,
    )

    # two cliques joined by one bridge: compute r in exact python
    pairs = list(combinations(range(4), 2)) + \
        list(combinations(range(10, 13), 2)) + [(0, 10)]
    got = degree_assortativity(_edges(spark, pairs)).collect()[0]
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [(deg[a], deg[b]) for a, b in pairs] + \
         [(deg[b], deg[a]) for a, b in pairs]
    m2 = len(xs)
    sxy = sum(x * y for x, y in xs)
    sx = sum(x for x, _ in xs)
    sxx = sum(x * x for x, _ in xs)
    num, den = m2 * sxy - sx * sx, m2 * sxx - sx * sx
    want = -((-num) * 1000000 // den) if num < 0 else num * 1000000 // den
    assert (got.m2, got.sxy, got.sx, got.sxx) == (m2, sxy, sx, sxx)
    assert got.r_ppm == want
