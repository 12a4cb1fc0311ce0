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
