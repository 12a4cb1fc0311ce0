

def test_ngram_novelty_exact_counts(spark):
    from biothings_crawler_spark.operators.text import ngram_novelty

    df = spark.createDataFrame([
        (1, "a b c d"),        # grams: "a b c", "b c d"
        (2, "a b c"),          # gram:  "a b c"  (shared with doc 1)
        (3, "x y z w"),        # both grams unique to doc 3
        (4, "a b"),            # too short: drops
        (5, None),             # NULL: drops
    ], "doc_id long, text string")
    got = {r.id: (r.n_grams, r.n_novel, r.novelty_ppm)
           for r in ngram_novelty(df, "doc_id", "text").collect()}
    assert got[1] == (2, 1, 500_000)   # "b c d" novel, "a b c" shared
    assert got[2] == (1, 0, 0)
    assert got[3] == (2, 2, 1_000_000)
    assert 4 not in got and 5 not in got


def test_ngram_novelty_repeated_gram_in_one_doc_counts_once(spark):
    from biothings_crawler_spark.operators.text import ngram_novelty

    df = spark.createDataFrame([
        (1, "a b c a b c a b c"),  # "a b c" repeats internally
        (2, "q r s"),
    ], "doc_id long, text string")
    got = {r.id: (r.n_grams, r.n_novel)
           for r in ngram_novelty(df, "doc_id", "text").collect()}
    # doc 1 has 7 positional grams but only 3 DISTINCT
    # ("a b c", "b c a", "c a b"); all df==1
    assert got[1] == (3, 3)
    assert got[2] == (1, 1)


def test_ngram_novelty_plan_no_window_no_cartesian(spark):
    from biothings_crawler_spark.operators.text import ngram_novelty

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = ngram_novelty(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("Window", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan


def test_lexicon_hits_ladder(spark):
    from biothings_crawler_spark.operators.text import lexicon_hits

    lex = {"zebra": 1, "okapi": 3}
    docs = [
        (1, "clean words only here " * 3),
        (2, "one zebra walked by " + "pad " * 26),        # flag
        (3, "Z3BR@ spotted " + "pad " * 28),              # leet fold -> flag
        (4, "an okapi appears " + "pad " * 30),           # severe -> drop
        (5, "zebra zebra zebra zebra"),                   # density -> drop
        (6, "the zebrafish is a fish " + "pad " * 20),    # no substring hit
        (7, '"zebra," quoted and punctuated ' + "pad " * 26),  # edge strip
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {r["id"]: r for r in lexicon_hits(df, "id", "text", lex).collect()}
    assert got[1]["verdict"] == "clean" and got[1]["n_hits"] == 0
    assert got[2]["verdict"] == "flag" and got[2]["score"] == 1
    assert got[3]["verdict"] == "flag" and got[3]["n_hits"] == 1
    assert got[4]["verdict"] == "drop" and got[4]["score"] == 3
    assert got[5]["verdict"] == "drop"
    assert got[5]["density_ppm"] == 1_000_000
    assert got[6]["verdict"] == "clean"      # Scunthorpe guard
    assert got[7]["n_hits"] == 1             # "zebra," matches
