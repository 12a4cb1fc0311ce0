"""Mojibake repair (operators/mojibake.fix_mojibake)."""

import duckdb
import pytest

from biothings_crawler_spark.operators.mojibake import (
    fix_mojibake,
    mojibake_oracle_sql,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, text string"
    )
    return {
        r.id: (r.mojibake, r.text_fixed)
        for r in fix_mojibake(df, "id", "text").collect()
    }


def _damage(s: str) -> str:
    return s.encode("utf-8").decode("cp1252")


def test_repairs_real_damage_lanes(spark):
    originals = [
        "café au lait",
        "déjà — vu… ‘quoted’",   # (”/U+201D damages to the cp1252 hole
                                  # 0x9D and can't round-trip; ’ can)
        "naïve résumé №",        # 3-byte № = U+2116
        "π ≈ 3.14159",
        "中文 text",              # CJK 3-byte
    ]
    out = _run(spark, [_damage(s) for s in originals])
    for i, s in enumerate(originals):
        assert out[i] == (True, s), (i, out[i])


def test_keeps_clean_and_ascii_and_invalid(spark):
    texts = [
        "plain ascii only",          # 0: no non-ascii, identity
        "genuine café naïve",        # 1: latin-1, inverse is invalid utf-8
        "",                          # 2: empty
        "À€x",                       # 3: overlong 2-byte (C0 80) must stay
        "í €x",                 # 4: ED A0 80 = surrogate, must stay
        "Ã",                         # 5: truncated lead at end, must stay
        "€abc",                      # 6: stray continuation-free special
    ]
    out = _run(spark, texts)
    for i, t in enumerate(texts):
        assert out[i] == (False, t), (i, out[i])


def test_four_byte_emoji_roundtrip(spark):
    s = "fire 🔥 emoji"
    out = _run(spark, [_damage(s)])
    assert out[0] == (True, s)


@pytest.mark.parametrize(
    "text",
    ["x " + _damage("héllo wörld"), "genuine café", "ascii", "À€", "Ã"],
)
def test_oracle_twin_agrees_per_row(spark, text):
    got = _run(spark, [text])[0]
    sql = "WITH m AS (SELECT 0 AS id, ? AS text),\n" + mojibake_oracle_sql(
        "m", "id", "text"
    )
    _, om, of = duckdb.execute(sql, [text]).fetchone()
    assert (bool(om), of) == got


def test_plan_is_row_local(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    plan = (
        fix_mojibake(df, "id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan
