"""Rendezvous sharding + TrustRank unit tests."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.sharding import (
    assign_shards,
    shard_rebalance_report,
)


def test_assign_shards_deterministic_and_balanced(spark):
    keys = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    )
    a = assign_shards(keys, "key", 8)
    counts = {r["shard"]: r["n"] for r in
              a.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == set(range(8))
    # uniform-ish: each shard within [125, 375] of the 250 expectation
    assert all(125 <= n <= 375 for n in counts.values()), counts
    # deterministic across evaluations
    b = assign_shards(keys, "key", 8)
    assert a.collect() == b.collect()


def test_rebalance_moves_only_to_new_shards(spark):
    """The HRW minimal-movement guarantee: growing 8 -> 12 shards,
    every moved key's new owner is one of the NEW shards [8, 12), and
    the moved fraction is near the theoretical (12-8)/12 = 1/3."""
    keys = spark.range(0, 3000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("key")
    )
    rep = shard_rebalance_report(keys, "key", 8, 12).collect()
    moved = [r for r in rep if r["moved"]]
    assert moved, "some keys must move"
    assert all(r["shard_to"] >= 8 for r in moved), [
        (r["shard_from"], r["shard_to"]) for r in moved if r["shard_to"] < 8]
    n_total = sum(r["n_keys"] for r in rep)
    n_moved = sum(r["n_keys"] for r in moved)
    assert n_total == 3000
    assert 0.25 < n_moved / n_total < 0.42, n_moved / n_total


def test_rebalance_plan_is_single_scan(spark):
    keys = spark.range(0, 100).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("key")
    )
    plan = shard_rebalance_report(keys, "key", 4, 6)._jdf.queryExecution(
    ).executedPlan().toString()
    # one bounded hash agg over a row-local projection; no join, no window
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_trustrank_unreached_nodes_zero(spark):
    """A two-island graph: seeds live on island A; island B (a 'link
    farm' citing only itself) must end at exactly rank 0, while plain
    pagerank gives it mass."""
    from biothings_crawler_spark.operators.pagerank import pagerank, trustrank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    tr = {r["node"]: r["rank"] for r in
          trustrank(edges, seeds, iters=4).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=4).collect()}
    assert tr[10] == 0 and tr[11] == 0
    assert pr[10] > 0 and pr[11] > 0
    assert tr[1] > 0 and tr[2] > 0 and tr[3] > 0  # trust propagates the cycle


def test_python_twin_matches_column(spark):
    """rendezvous_shard_py (driver-side probe pruning) must agree with
    the rendezvous_shard_col expression for every key — same md5-u60,
    same tie-break."""
    from biothings_crawler_spark.operators.sharding import (
        rendezvous_shard_col,
        rendezvous_shard_py,
    )

    keys = spark.range(0, 300).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("key")
    )
    got = {r["key"]: r["s"] for r in keys.select(
        "key", rendezvous_shard_col(F.col("key"), 16, "ix").alias("s")
    ).collect()}
    for k, s in got.items():
        assert rendezvous_shard_py(k, 16, "ix") == s, k


def test_sharded_postings_index_prunes_partitions(spark, tmp_path):
    """write_postings_index + probe_postings round-trip: the probe
    result equals the in-memory chunks filtered to the query terms,
    and the probe SCAN carries a static shard PartitionFilter — the
    directory-level pruning that makes a Q-term query touch <= Q of
    n_shards at 10^10 docs."""
    from biothings_crawler_spark.operators.bm25 import (
        inverted_postings,
        postings_chunks,
        probe_postings,
        write_postings_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7}") for i in range(50)], "id long, text string"
    )
    chunks = postings_chunks(inverted_postings(docs, "id", "text"),
                             chunk_range=16)
    path = str(tmp_path / "pidx")
    write_postings_index(chunks, path, n_shards=8, salt="ix")
    probed = probe_postings(spark, path, ["alpha", "w3"], n_shards=8, salt="ix")
    want = sorted(map(tuple, chunks.filter(
        F.col("term").isin(["alpha", "w3"])).collect()))
    assert sorted(map(tuple, probed.collect())) == want
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    # the partition filter is non-empty (shard IN (...)), i.e. not
    # "PartitionFilters: []"
    import re
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and m.group(1).strip(), plan
