"""MaxScore-pruned retrieval (operators/bm25.maxscore_topk)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.bm25 import (
    _maxscore_parts,
    bm25_topk,
    maxscore_topk,
)


def _skewed_corpus(spark):
    """One rare high-impact term ('zebra', 4 docs) and one ubiquitous
    low-impact term ('filler', every doc): the classic MaxScore-winning
    shape — 'filler' is non-essential once theta is set by the zebra
    postings, so filler-only docs are never rescored."""
    rows = []
    for i in range(200):
        body = "filler " * (3 + i % 5)
        if i % 50 == 7:
            body += "zebra zebra "
        rows.append((i, body + f"pad{i} pad{i} end"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_equals_exhaustive_on_skewed_corpus(spark):
    d = _skewed_corpus(spark)
    q = ["zebra", "filler"]
    got = [(r.id, r.score) for r in maxscore_topk(d, "doc_id", "text", q, k=4).collect()]
    want = [(r.id, r.score) for r in bm25_topk(d, "doc_id", "text", q, k=4).collect()]
    assert got == want and len(got) == 4


def test_pruning_actually_prunes(spark):
    d = _skewed_corpus(spark)
    parts = _maxscore_parts(d, "doc_id", "text", ["zebra", "filler"], k=4)
    essential = {r.term for r in parts["essential"].collect()}
    assert essential == {"zebra"}  # filler's UB can't reach theta
    n_cand = parts["cand"].count()
    n_match = parts["ts"].select("id").distinct().count()
    assert n_cand == 4 and n_match == 200


def test_fewer_than_k_matches_disables_pruning_safely(spark):
    d = _skewed_corpus(spark)
    q = ["zebra"]  # only 4 matching docs, k=10
    got = [(r.id, r.score) for r in maxscore_topk(d, "doc_id", "text", q, k=10).collect()]
    want = [(r.id, r.score) for r in bm25_topk(d, "doc_id", "text", q, k=10).collect()]
    assert got == want and len(got) == 4


def test_equals_exhaustive_on_flat_vocab(spark, sf_dir="/root/testdata/sf0.001"):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = ["merge", "vector", "window"]
    got = [(r.id, r.score) for r in maxscore_topk(d, "doc_id", "text", q, k=7).collect()]
    want = [(r.id, r.score) for r in bm25_topk(d, "doc_id", "text", q, k=7).collect()]
    assert got == want


def test_blockmax_safety_topk_chunks_never_skippable(spark):
    from biothings_crawler_spark.operators.bm25 import (
        blockmax_report,
        bm25_topk,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boosted = d.select(
        "doc_id",
        F.when(F.expr("doc_id div 64") == 5,
               F.concat(F.col("text"),
                        F.expr("repeat(' data table spark', 25)")))
        .otherwise(F.col("text")).alias("text"))
    q = ["data", "table", "spark"]
    rep = blockmax_report(boosted, "doc_id", "text", q, k=10,
                          chunk_range=64)
    top = bm25_topk(boosted, "doc_id", "text", q, k=10).select(
        F.expr("id div 64").alias("chunk_no"))
    # the BMW bound is safe: any chunk containing a top-k doc's
    # postings has upper_bound >= that doc's full score >= theta
    bad = rep.join(top.distinct(), "chunk_no").filter(
        F.col("skippable") == 1)
    assert bad.count() == 0
    # and the fixture exercises BOTH branches
    flags = {r["skippable"] for r in rep.select("skippable").collect()}
    assert flags == {0, 1}


def test_blockmax_hand_computed_bound(spark):
    from biothings_crawler_spark.operators.bm25 import blockmax_report

    # two terms; doc 0 (chunk 0) heavy in both, doc 100 (chunk 1)
    # carries a single weak 'b'. k=1 -> theta = doc 0's total; chunk 1
    # for 'b' is skippable iff its block_max + g_max('a') < theta.
    docs = spark.createDataFrame(
        [(0, "a a a b b b"), (100, "b c c c c c")],
        "doc_id long, text string")
    rep = {(r["term"], r["chunk_no"]): r for r in blockmax_report(
        docs, "doc_id", "text", ["a", "b"], k=1, chunk_range=64).collect()}
    a0 = rep[("a", 0)]; b0 = rep[("b", 0)]; b1 = rep[("b", 1)]
    theta = a0["block_max"] + b0["block_max"]  # doc 0 holds both maxima
    assert a0["skippable"] == 0 and b0["skippable"] == 0
    assert b1["upper_bound"] == b1["block_max"] + a0["block_max"]
    assert b1["skippable"] == (1 if b1["upper_bound"] < theta else 0)
    assert b1["skippable"] == 1  # weak tf + shorter-doc norm can't catch up
