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
