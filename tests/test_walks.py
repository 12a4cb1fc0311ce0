"""Deterministic random walks (operators/walks)."""

from biothings_crawler_spark.operators.walks import random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_walks_follow_edges_and_truncate_at_sinks(spark):
    e = _edges(spark, [(0, 1), (1, 2)])  # 2 is a sink
    rows = random_walks(e, walk_len=5, walks_per_node=1).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["cur"]
    w0 = by_walk[(0, 0)]
    # single out-edge everywhere: the walk is forced 0 -> 1 -> 2, stop
    assert [w0[s] for s in sorted(w0)] == [0, 1, 2]
    assert max(w0) == 2  # truncated at the sink, not padded to len 5


def test_walks_deterministic_across_runs(spark):
    e = _edges(spark, [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)])
    a = sorted(map(tuple, random_walks(e, walk_len=4, walks_per_node=2).collect()))
    b = sorted(map(tuple, random_walks(e, walk_len=4, walks_per_node=2).collect()))
    assert a == b


def test_distinct_walk_ids_diverge(spark):
    # star with 5 choices from the hub: 4 walks from node 0 should not
    # all pick the same first neighbor (coins differ by walk id)
    e = _edges(spark, [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)])
    rows = random_walks(e, walk_len=1, walks_per_node=4).collect()
    firsts = {r["walk"]: r["cur"] for r in rows
              if r["start"] == 0 and r["step"] == 1}
    assert len(firsts) == 4
    assert len(set(firsts.values())) >= 2


def test_every_step_is_a_real_edge(spark):
    pairs = [(i, (i * 5 + 1) % 13) for i in range(13)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    edge_set = set(pairs)
    rows = random_walks(e, walk_len=3, walks_per_node=2).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["cur"]
    for steps in by_walk.values():
        seq = [steps[s] for s in sorted(steps)]
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in edge_set
