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


def _scored(spark, rows):
    return spark.createDataFrame(rows, "id long, lang string, score_ppm long")


def test_terciles_exact_thirds(spark):
    from biothings_crawler_spark.operators.lm import (
        bucket_by_terciles,
        tercile_cutoffs,
    )

    rows = [(i, "en", i * 1000) for i in range(9)]
    sc = _scored(spark, rows)
    out = bucket_by_terciles(sc, tercile_cutoffs(sc, "lang"), "lang")
    got = {r["id"]: r["bucket"] for r in out.collect()}
    assert [got[i] for i in range(9)] == (
        ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
    )


def test_terciles_one_bin_never_splits(spark):
    from biothings_crawler_spark.operators.lm import (
        bucket_by_terciles,
        tercile_cutoffs,
    )

    sc = _scored(spark, [(i, "en", 42_000) for i in range(10)])
    out = bucket_by_terciles(sc, tercile_cutoffs(sc, "lang"), "lang")
    assert {r["bucket"] for r in out.collect()} == {"head"}


def test_terciles_per_group_independent(spark):
    from biothings_crawler_spark.operators.lm import (
        bucket_by_terciles,
        tercile_cutoffs,
    )

    rows = [(i, "en", i * 1000) for i in range(9)] + [
        (100 + i, "de", 500_000 + i * 1000) for i in range(9)
    ]
    sc = _scored(spark, rows)
    out = bucket_by_terciles(sc, tercile_cutoffs(sc, "lang"), "lang")
    got = {r["id"]: r["bucket"] for r in out.collect()}
    # de's scores all dwarf en's, but each language gets its own thirds
    assert got[8] == "head" and got[100] == "tail" and got[108] == "head"


def test_terciles_singleton_group_is_head(spark):
    from biothings_crawler_spark.operators.lm import (
        bucket_by_terciles,
        tercile_cutoffs,
    )

    sc = _scored(spark, [(1, "fr", 7)])
    out = bucket_by_terciles(sc, tercile_cutoffs(sc, "lang"), "lang")
    assert out.collect()[0]["bucket"] == "head"


def test_host_prior_smoothing(spark):
    from biothings_crawler_spark.operators.text import smooth_lang_by_host

    rows = [
        (1, "a", "en"), (2, "a", "en"), (3, "a", "de"), (4, "a", "und"),
        (5, "b", "und"),                       # host with no confident doc
        (6, "c", "de"), (7, "c", "und"),
    ]
    df = spark.createDataFrame(rows, "id long, host string, lang string")
    got = {r["id"]: r for r in
           smooth_lang_by_host(df, "id", "host", "lang").collect()}
    assert got[4]["lang_smoothed"] == "en" and got[4]["from_host_prior"]
    assert got[7]["lang_smoothed"] == "de" and got[7]["from_host_prior"]
    assert got[5]["lang_smoothed"] == "und" and not got[5]["from_host_prior"]
    # confident labels never overridden
    assert got[3]["lang_smoothed"] == "de" and not got[3]["from_host_prior"]


def test_host_prior_tie_breaks_lexicographically(spark):
    from biothings_crawler_spark.operators.text import smooth_lang_by_host

    rows = [(1, "a", "es"), (2, "a", "de"), (3, "a", "und")]
    df = spark.createDataFrame(rows, "id long, host string, lang string")
    got = {r["id"]: r["lang_smoothed"] for r in
           smooth_lang_by_host(df, "id", "host", "lang").collect()}
    assert got[3] == "de"  # 1-1 tie -> lexicographically smaller wins


def test_curriculum_budgets_respected_per_stage(spark):
    from biothings_crawler_spark.plans.driver_queries import (
        CURRICULUM_BUDGETS,
        q_curriculum,
    )

    rows = q_curriculum(spark, "/root/testdata/sf0.001").collect()
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) <= set(CURRICULUM_BUDGETS)
    for stage, docs in by_stage.items():
        budget = CURRICULUM_BUDGETS[stage]
        assert sum(d["n_tok"] for d in docs) <= budget
        assert max(d["cum_tokens"] for d in docs) <= budget
        # quality-first: the selected set's scores dominate — every
        # selected doc's score >= the stage's selection boundary
        assert all(d["cum_tokens"] > 0 for d in docs)


# --- interpolated Kneser-Ney + stupid backoff (train_kn_bigram,
# kn_score, train_stupid_backoff, sb_score) -------------------------


def _kn_train(spark):
    # bigrams: 'a b' x2, 'b a' x2, 'a c' x1
    return spark.createDataFrame([(1, "a b a b a c")], "id long, text string")


def test_kn_hand_computed_values(spark):
    from biothings_crawler_spark.operators.lm import kn_score, train_kn_bigram

    model = train_kn_bigram(_kn_train(spark), "id", "text")
    docs = spark.createDataFrame(
        [
            (1, "a b a c"),   # seen bigrams: 583332 + 749999 + 249999
            (2, "a a"),       # unseen bg, seen w1: lambda(a)*pc(a)
            (3, "x a"),       # unseen w1: continuation prob alone
            (4, "x z"),       # fully OOV
            (5, None),        # NULL text scores like empty
        ],
        "id long, text string",
    )
    out = {r.id: r for r in kn_score(docs, model, "id", "text").collect()}
    # pc_ppm = 1e6 // 3 = 333333 for a, b, c (one left context each);
    # w1tab: a -> (c1=3, n1w1=2), b -> (c1=2, n1w1=1)
    assert out[1].kn_ppm == (583332 + 749999 + 249999) // 3
    assert out[1].n_seen == 3 and out[1].oov_ppm == 0
    assert out[2].kn_ppm == (3 * 2 * 333333) // (4 * 3)  # 166666
    assert out[2].n_seen == 0 and out[2].oov_ppm == 1_000_000
    assert out[3].kn_ppm == 333333
    assert out[4].kn_ppm == 0
    assert out[5].n_bigrams == 0 and out[5].kn_ppm == 0


def test_kn_context_mass_normalizes(spark):
    # interpolated KN is a proper distribution: summing p(w2|'a') over
    # the whole vocab {a,b,c} recovers 1e6 ppm up to floor loss
    from biothings_crawler_spark.operators.lm import kn_score, train_kn_bigram

    model = train_kn_bigram(_kn_train(spark), "id", "text")
    probes = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a a")], "id long, text string"
    )
    total = sum(
        r.kn_ppm for r in kn_score(probes, model, "id", "text").collect()
    )
    assert 999_990 <= total <= 1_000_000


def test_stupid_backoff_hand_computed(spark):
    from biothings_crawler_spark.operators.lm import (
        sb_score,
        train_stupid_backoff,
    )

    model = train_stupid_backoff(_kn_train(spark), "id", "text")
    docs = spark.createDataFrame(
        [
            (1, "a b a c"),  # 666666 + 1000000 + 333333 over 3
            (2, "a a"),      # unseen: alpha * cw(a)/ntok = 2*3e6 // 30
            (3, "x z"),      # fully OOV
        ],
        "id long, text string",
    )
    out = {r.id: r for r in sb_score(docs, model, "id", "text").collect()}
    assert out[1].sb_ppm == (666666 + 1000000 + 333333) // 3
    assert out[2].sb_ppm == 200000 and out[2].oov_ppm == 1_000_000
    assert out[3].sb_ppm == 0


def test_kn_sb_plans_no_window_no_python(spark):
    from biothings_crawler_spark.operators.lm import (
        kn_score,
        sb_score,
        train_kn_bigram,
        train_stupid_backoff,
    )

    docs = _kn_train(spark)
    for scored in (
        kn_score(docs, train_kn_bigram(docs, "id", "text"), "id", "text"),
        sb_score(docs, train_stupid_backoff(docs, "id", "text"), "id", "text"),
    ):
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "BatchEvalPython" not in plan


def test_kn_property_random_corpora(spark):
    """Property check: kn_score equals a brute-force pure-Python
    interpolated-KN model (same documented spec) on random tiny
    corpora — seen/backoff/unseen-context lanes and the empty-train
    edge all emerge from the generator."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from biothings_crawler_spark.operators.lm import kn_score, train_kn_bigram

    P = 10**6

    def py_kn(train_texts, score_texts):
        bg = Counter()
        for t in train_texts:
            ws = t.split()
            for i in range(len(ws) - 1):
                bg[(ws[i], ws[i + 1])] += 1
        c1, n1w1, n1w2 = Counter(), Counter(), Counter()
        for (w1, w2), c in bg.items():
            c1[w1] += c
            n1w1[w1] += 1
            n1w2[w2] += 1
        n1tot = len(bg)
        pc = {w: n1w2[w] * P // n1tot for w in n1w2} if n1tot else {}
        out = []
        for t in score_texts:
            ws = t.split()
            n = len(ws) - 1 if len(ws) >= 2 else 0
            s = seen = 0
            for i in range(len(ws) - 1):
                w1, w2 = ws[i], ws[i + 1]
                p = pc.get(w2, 0)
                if (w1, w2) in bg:
                    c = bg[(w1, w2)]
                    s += ((4 * c - 3) * P // (4 * c1[w1])
                          + (3 * n1w1[w1] * p) // (4 * c1[w1]))
                    seen += 1
                elif w1 in c1:
                    s += (3 * n1w1[w1] * p) // (4 * c1[w1])
                else:
                    s += p
            out.append((n, seen, s // n if n > 0 else 0,
                        (n - seen) * P // n if n > 0 else 0))
        return out

    word = st.sampled_from(["a", "b", "c", "d"])
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(doc, min_size=1, max_size=6),
           st.lists(doc, min_size=1, max_size=6))
    def check(train_texts, score_texts):
        train = spark.createDataFrame(
            list(enumerate(train_texts)), "id long, text string")
        score = spark.createDataFrame(
            list(enumerate(score_texts)), "id long, text string")
        model = train_kn_bigram(train, "id", "text")
        got = {
            r.id: (r.n_bigrams, r.n_seen, r.kn_ppm, r.oov_ppm)
            for r in kn_score(score, model, "id", "text").collect()
        }
        want = dict(enumerate(py_kn(train_texts, score_texts)))
        assert got == want

    check()
