"""Exact char-entropy gibberish detector (operators/text.char_entropy)."""

from biothings_crawler_spark.operators.text import char_entropy

FXP = 65536
LG3 = 103872  # floor(65536 * log2 3), exact


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return {r.id: r for r in char_entropy(df, "id", "text").collect()}


def test_hand_computed(spark):
    out = _run(spark, [(1, "aaaa"), (2, "ab"), (3, ""), (4, "abcd"),
                       (5, "aab")])
    # uniform char: zero information
    assert out[1].ent_tot_fxp == 0 and out[1].ent_char_fxp == 0
    assert out[1].n_chars == 4 and out[1].n_distinct == 1
    # two distinct chars once each: 2*lg2 total, exactly 1 bit/char
    assert out[2].ent_tot_fxp == 2 * FXP and out[2].ent_char_fxp == FXP
    # empty text: all zeros (and still one output row)
    assert tuple(out[3])[1:] == (0, 0, 0, 0)
    # 4 distinct: 4*lg4 = 8*FXP, 2 bits/char
    assert out[4].ent_tot_fxp == 8 * FXP and out[4].ent_char_fxp == 2 * FXP
    # 'aab': 3*lg3 - 2*lg2 exactly
    assert out[5].ent_tot_fxp == 3 * LG3 - 2 * FXP
    assert out[5].ent_char_fxp == (3 * LG3 - 2 * FXP) // 3


def test_orders_gibberish_below_natural_spread(spark):
    out = _run(spark, [
        (1, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),       # mash: 0 bits
        (2, "the quick brown fox jumps over it"),     # natural english
        (3, "qwxzjkvbpqwxzjkvbp"),                    # high-spread noise
    ])
    assert out[1].ent_char_fxp == 0
    assert 0 < out[2].ent_char_fxp < 5 * FXP
    # noise uses 9 distinct chars evenly: higher rate than the mash
    assert out[3].ent_char_fxp > out[1].ent_char_fxp


def test_plan_is_row_local(spark):
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    plan = (
        char_entropy(df, "id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
    assert "Window" not in plan


def test_tokenizer_fertility_hand_computed(spark):
    from biothings_crawler_spark.operators.text import tokenizer_fertility

    docs = spark.createDataFrame(
        [
            (1, "en", "don't stop"),        # words 2; tokens: don ' t stop = 4
            (2, "en", "a b"),               # words 2; tokens 2
            (3, "zz", ""),                  # empty: all zeros, no div-by-0
        ],
        "id long, lang string, text string",
    )
    out = {r.lang: r for r in
           tokenizer_fertility(docs, "id", "text", "lang").collect()}
    en = out["en"]
    assert (en.n_docs, en.words, en.tokens, en.chars) == (2, 4, 6, 13)
    assert en.fertility_ppm == 6 * 1_000_000 // 4
    assert en.chars_per_token_ppm == 13 * 1_000_000 // 6
    zz = out["zz"]
    assert (zz.words, zz.tokens, zz.fertility_ppm,
            zz.chars_per_token_ppm) == (0, 0, 0, 0)
