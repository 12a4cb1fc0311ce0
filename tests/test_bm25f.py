"""BM25F field weighting: anchor-text hits must move a page's rank in
a way body-only BM25 cannot, and anchor-only ids outside the corpus
must not surface."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.bm25 import bm25_topk, bm25f_topk


def test_anchor_hits_outrank_body_only(spark):
    rows = [
        (1, "spark spark table data notes", "plain link"),
        (2, "unrelated words entirely here", "spark data table spark data"),
        (3, "spark mention once among words", "plain link"),
        (4, "totally other content rows", "nothing"),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "id long, text string")
    anchors = spark.createDataFrame(
        [(i, a) for i, _, a in rows], "id long, anchor string")
    q = ["spark", "data", "table"]

    body_only = {r["id"]: n for n, r in enumerate(
        bm25_topk(docs, "id", "text", q).collect())}
    fielded = {r["id"]: n for n, r in enumerate(
        bm25f_topk(docs, anchors, "id", "text", "anchor", q,
                   w_anchor=3).collect())}
    # doc 2 has NO body hits: invisible to body BM25, top-tier in BM25F
    assert 2 not in body_only
    assert 2 in fielded and fielded[2] <= 1
    # body evidence still counts: doc 1 stays ranked
    assert 1 in fielded


def test_anchor_only_ids_outside_corpus_drop(spark):
    docs = spark.createDataFrame(
        [(1, "spark data here")], "id long, text string")
    anchors = spark.createDataFrame(
        [(1, "spark"), (99, "spark data table")], "id long, anchor string")
    got = {r["id"] for r in bm25f_topk(
        docs, anchors, "id", "text", "anchor",
        ["spark", "data", "table"]).collect()}
    assert got == {1}
