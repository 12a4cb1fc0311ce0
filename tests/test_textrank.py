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


# --- sentence-level extractive summarization ------------------------------

def _brute_summary(text, rounds, n):
    import re as _re
    sents = [s.strip() for s in _re.split(r"(?<=[.!?])\s+", text or "")
             if s.strip()]
    tw = [sorted(set(x for x in s.lower().split() if x)) for s in sents]
    nodes = [i for i, t in enumerate(tw) if t]
    edges = {}
    for i in nodes:
        for j in nodes:
            if i < j:
                c = len(set(tw[i]) & set(tw[j]))
                w = c * 10**6 // (len(tw[i]) + len(tw[j]))
                if w > 0:
                    edges[(i, j)] = w
    adj = {}
    for (i, j), w in edges.items():
        adj.setdefault(i, []).append((j, w))
        adj.setdefault(j, []).append((i, w))
    if not adj:
        return []
    wout = {i: sum(w for _, w in nb) for i, nb in adj.items()}
    s = {i: 10**6 for i in adj}
    for _ in range(rounds):
        nxt = {}
        for i in adj:
            inflow = sum(s[j] * 85 * w // (100 * wout[j])
                         for j, w in adj[i])
            nxt[i] = 150000 + inflow
        s = nxt
    order = sorted(s, key=lambda i: (-s[i], i))[:n]
    return [(si, s[si], r + 1) for r, si in enumerate(order)]


def test_summary_matches_reference(spark):
    import random as _random

    from biothings_crawler_spark.operators.textrank import textrank_summary

    rng = _random.Random(31)
    vocab = ["cat", "dog", "run", "sky", "sea", "oak"]
    docs = []
    for i in range(40):
        parts = []
        for _ in range(rng.randint(1, 8)):
            parts.append(" ".join(rng.choice(vocab)
                                  for _ in range(rng.randint(1, 6))) + ".")
        docs.append((i, " ".join(parts)))
    df = spark.createDataFrame(docs, "id long, t string")
    got = sorted(
        (r["id"], r["si"], r["score_micro"], r["pick"])
        for r in textrank_summary(df, "id", "t", rounds=3, n=2).collect())
    want = sorted((i, *row) for i, t in docs
                  for row in _brute_summary(t, 3, 2))
    assert got == want


def test_summary_isolated_and_single_sentence(spark):
    from biothings_crawler_spark.operators.textrank import textrank_summary

    df = spark.createDataFrame(
        [(1, "just one sentence no boundary"),
         (2, "alpha beta gamma. delta eps zeta."),  # disjoint vocab
         (3, "cat dog run. cat dog walk. bird dog run.")],
        "id long, t string")
    rows = textrank_summary(df, "id", "t", rounds=2, n=2).collect()
    ids = {r["id"] for r in rows}
    # single-sentence and vocabulary-disjoint docs have no edges
    assert ids == {3}
    got = sorted((r["pick"], r["si"]) for r in rows)
    assert len(got) == 2 and got[0][0] == 1
