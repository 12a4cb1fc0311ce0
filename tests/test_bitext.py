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
