"""TextRank keyword extraction (operators/textrank)."""

from biothings_crawler_spark.operators.textrank import (
    cooccurrence_edges,
    textrank_keywords,
)


def _docs(spark):
    # 'core' is adjacent to everything; satellites only touch 'core'
    rows = [
        (1, "core alpha core beta core gamma"),
        (2, "delta core epsilon core"),
        (3, "core zeta"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_edges_symmetric_weighted_no_self_loops(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b b b")], "id long, text string"
    )
    edges = {(r.src, r.dst): r.w
             for r in cooccurrence_edges(docs, "text").collect()}
    # bigrams: ab, ba, ab, bb(self, dropped), bb(dropped)
    assert edges == {("a", "b"): 3, ("b", "a"): 3}


def test_hub_word_ranks_first(spark):
    out = textrank_keywords(_docs(spark), "text", rounds=4, k=10).collect()
    assert out[0].term == "core"
    # every neighbor votes for core; satellites split core's vote
    sats = {r.term: r.score_micro for r in out[1:]}
    assert all(s < out[0].score_micro for s in sats.values())


def test_scores_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    a = [(r.term, r.score_micro) for r in
         textrank_keywords(docs, "text", rounds=3, k=10).collect()]
    b = [(r.term, r.score_micro) for r in
         textrank_keywords(docs.repartition(7), "text", rounds=3,
                           k=10).collect()]
    assert a == b


def test_isolated_words_never_keywords(spark):
    docs = spark.createDataFrame(
        [(1, "linked pair"), (2, "loner")], "id long, text string"
    )
    terms = {r.term for r in
             textrank_keywords(docs, "text", rounds=2, k=10).collect()}
    assert terms == {"linked", "pair"}
