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
