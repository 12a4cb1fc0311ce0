"""Bilingual-lexicon bitext verification (operators/bitext)."""

from biothings_crawler_spark.operators.bitext import bitext_lexicon_score


def _fixture(spark):
    src = spark.createDataFrame(
        [
            ("s1", "the cat sat"),
            ("s2", "the dog ran far"),
            ("s3", ""),            # empty source: zero counts, score 0
        ],
        "url string, text string",
    )
    tgt = spark.createDataFrame(
        [
            ("t1", "le chat assis"),       # full translation of s1
            ("t2", "le chien unrelated"),  # covers the/dog, misses ran
            ("t3", "anything"),
        ],
        "url string, text string",
    )
    lex = spark.createDataFrame(
        [
            ("the", "le"),
            ("cat", "chat"),
            ("sat", "assis"),
            ("dog", "chien"),
            ("dog", "clebard"),   # second translation: ANY hit counts
            ("ran", "courait"),
            # 'far' is out-of-dictionary -> excluded from n_lexical
        ],
        "src_word string, tgt_word string",
    )
    pairs = spark.createDataFrame(
        [("s1", "t1"), ("s2", "t2"), ("s3", "t3")],
        "src_url string, tgt_url string",
    )
    return pairs, src, tgt, lex


def test_overlap_full_partial_and_empty(spark):
    pairs, src, tgt, lex = _fixture(spark)
    out = {
        r.src_url: r
        for r in bitext_lexicon_score(pairs, src, tgt, lex).collect()
    }
    # s1: 3 distinct words, all lexical, all covered
    assert (out["s1"].n_src_words, out["s1"].n_lexical,
            out["s1"].n_covered, out["s1"].overlap_ppm) == (3, 3, 3, 1_000_000)
    # s2: 4 distinct words, 'far' not in lexicon -> n_lexical 3;
    # covered: the->le yes, dog->chien yes (clebard miss doesn't hurt),
    # ran->courait no  => 2/3
    assert (out["s2"].n_src_words, out["s2"].n_lexical,
            out["s2"].n_covered) == (4, 3, 2)
    assert out["s2"].overlap_ppm == 2 * 1_000_000 // 3
    # s3: empty source still reports a row
    assert (out["s3"].n_src_words, out["s3"].overlap_ppm) == (0, 0)


def test_type_not_token_overlap(spark):
    # a word repeated 100x counts once: distinct-type semantics
    src = spark.createDataFrame(
        [("s", "spam " * 100 + "ham")], "url string, text string"
    )
    tgt = spark.createDataFrame([("t", "jambon")], "url string, text string")
    lex = spark.createDataFrame(
        [("spam", "dosenfleisch"), ("ham", "jambon")],
        "src_word string, tgt_word string",
    )
    pairs = spark.createDataFrame([("s", "t")], "src_url string, tgt_url string")
    r = bitext_lexicon_score(pairs, src, tgt, lex).collect()[0]
    assert (r.n_src_words, r.n_lexical, r.n_covered) == (2, 2, 1)
    assert r.overlap_ppm == 500_000


def test_plan_broadcasts_lexicon_no_python(spark):
    pairs, src, tgt, lex = _fixture(spark)
    plan = (
        bitext_lexicon_score(pairs, src, tgt, lex)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_margin_mining_separates_true_pairs_from_decoys(spark):
    import math
    import random

    from biothings_crawler_spark.operators.bitext import margin_mining

    rng = random.Random(3)
    dim = 16

    def vec():
        return [rng.gauss(0, 1) for _ in range(dim)]

    def cos_ppm(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return math.floor(
            d / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b))) * 1_000_000)

    srcs = {i: vec() for i in range(30)}
    tgts = {}
    for i, v in srcs.items():
        if i % 5 == 2:  # decoy: unrelated target
            tgts[i] = vec()
        else:           # true pair: tiny perturbation
            tgts[i] = [x + 0.01 * ((i + j) % 5 - 2)
                       for j, x in enumerate(v)]
    cand = [(s, t, cos_ppm(sv, tv))
            for s, sv in srcs.items() for t, tv in tgts.items()]
    df = spark.createDataFrame(
        cand, "src_id long, tgt_id long, cos_ppm long")
    got = {(r["src_id"], r["tgt_id"]): r
           for r in margin_mining(df).collect()}
    mined = {k for k, r in got.items() if r["mined"] == 1}
    true_pairs = {(i, i) for i in srcs if i % 5 != 2}
    # every true pair is mined; no decoy src appears in a mined pair
    assert true_pairs <= mined
    assert all(s % 5 != 2 for s, _ in mined)
    # margins separate: every true pair beats every non-true mined-out
    true_margins = [got[p]["margin_ppm"] for p in true_pairs]
    other = [r["margin_ppm"] for k, r in got.items()
             if k not in true_pairs]
    assert min(true_margins) >= 1_300_000
    assert all(m < 1_300_000 for m in other)


def test_margin_mining_mutual_best_is_one_to_one(spark):
    from biothings_crawler_spark.operators.bitext import margin_mining

    df = spark.createDataFrame(
        [(1, 10, 900000), (1, 11, 880000),
         (2, 10, 890000), (2, 11, 700000)],
        "src_id long, tgt_id long, cos_ppm long")
    rows = margin_mining(df).collect()
    # src 1 and src 2 both prefer tgt 10, but tgt 10 prefers src 1:
    # only (1,10) is mutual-best
    assert [(r["src_id"], r["tgt_id"]) for r in rows] == [(1, 10)]
