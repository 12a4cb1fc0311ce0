"""Bigram-LM corpus scoring (operators/lm)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.lm import lm_score, train_bigram_lm


def _docs(spark):
    fluent = "the cat sat on the mat and the dog sat on the rug"
    return spark.createDataFrame(
        [
            (1, fluent),
            (2, fluent),
            (3, "the cat sat on the mat"),         # all bigrams in-model
            (4, "zq xv qj zk wq pf"),              # gibberish: all OOV
            (5, "the cat sat on the mat zq xv qj zk wq pf zz yy"),  # mixed
            (6, "one"),                            # no bigram
        ],
        "id long, text string",
    )


def test_train_counts_and_prefix_totals(spark):
    model = {
        r.bg: (r.c12, r.c1)
        for r in train_bigram_lm(_docs(spark), "id", "text", 2).collect()
    }
    # 'the cat': docs 1,2,3,5 -> 4; prefix 'the' starts 12 bigram
    # tokens ('the cat' x4, 'the mat' x4, 'the dog' x2, 'the rug' x2)
    assert model["the cat"] == (4, 12)
    # 'sat on': 2 per fluent doc + 1 each in docs 3 and 5
    assert model["sat on"] == (6, 6)
    # singleton bigrams pruned ('zz yy' appears only in doc 5)
    assert "zz yy" not in model


def test_score_buckets_and_oov(spark):
    docs = _docs(spark)
    model = train_bigram_lm(docs.filter("id <= 3"), "id", "text", 1)
    out = {r.id: r for r in lm_score(docs, model, "id", "text").collect()}
    assert out[3].oov_ppm == 0 and out[3].bucket == "head"
    assert out[4].score_ppm == 0 and out[4].oov_ppm == 1_000_000
    assert out[4].bucket == "tail"
    assert 0 < out[5].score_ppm < out[3].score_ppm
    assert out[6].n_bigrams == 0 and out[6].bucket == "tail"


def test_score_is_exact_integer_mean(spark):
    # two-doc corpus: model p('a b') = 2/2 = 1.0, p('b a') = 1/1
    docs = spark.createDataFrame([(1, "a b a b")], "id long, text string")
    model = train_bigram_lm(docs, "id", "text", 1)
    r = lm_score(docs, model, "id", "text").collect()[0]
    # bigrams: 'a b' x2 (c12=2,c1=2 -> 1e6), 'b a' x1 (c12=1,c1=1 -> 1e6)
    assert r.score_ppm == 1_000_000 and r.n_seen == 3


def test_plan_no_window_no_python(spark):
    docs = _docs(spark)
    model = train_bigram_lm(docs, "id", "text", 2)
    plan = (
        lm_score(docs, model, "id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "BatchEvalPython" not in plan
