"""Hashed multinomial Naive Bayes (operators/nbayes)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.nbayes import (
    FXP,
    ilog2_fxp_duck,
    ilog2_fxp_spark,
    nb_classify,
    nb_train,
)


@pytest.mark.parametrize(
    "x",
    [1, 2, 3, 5, 7, 10, 100, 255, 256, 257, 65535, 65536, 10**9,
     2**40, 2**46 - 1, 2**46],
)
def test_ilog2_fxp_exact_both_engines(spark, x):
    want = math.floor(FXP * math.log2(x))
    got_spark = spark.sql(
        f"SELECT {ilog2_fxp_spark(str(x))} AS v"
    ).collect()[0].v
    got_duck = duckdb.sql(f"SELECT {ilog2_fxp_duck(str(x))} AS v").fetchone()[0]
    assert got_spark == want == got_duck


def _corpus(spark):
    # 3 labels, each with a distinctive marker token; shared filler
    rows = []
    for i in range(60):
        lab = ["en", "de", "fr"][i % 3]
        rows.append((i, lab, f"common words here m{lab} m{lab} m{lab}"))
    return spark.createDataFrame(rows, "id long, lang string, text string")


def test_train_weights_hand_computed(spark):
    # one label, one word repeated: cnt grid is dense over all buckets
    docs = spark.createDataFrame(
        [(1, "x", "aa aa"), (2, "x", "aa")], "id long, lang string, text string"
    )
    model = nb_train(docs, "id", "text", "lang", n_buckets=4).collect()
    cond = {r.bucket: r.w_fxp for r in model if r.bucket >= 0}
    assert len(cond) == 4  # dense: every bucket materialized
    # total tf = 3, V = 4; the aa-bucket has cnt 3 -> lg(4) - lg(7),
    # the other three have cnt 0 -> lg(1) - lg(7)
    lg = lambda v: math.floor(FXP * math.log2(v))
    assert sorted(cond.values()) == sorted(
        [lg(4) - lg(7)] + [lg(1) - lg(7)] * 3
    )
    prior = [r.w_fxp for r in model if r.bucket == -1]
    assert prior == [lg(2) - lg(2)]  # single label: lg(2/2) = 0


def test_classifier_learns_planted_markers(spark):
    docs = _corpus(spark)
    model = nb_train(docs.filter("id % 2 = 0"), "id", "text", "lang",
                     n_buckets=64)
    pred = nb_classify(docs, model, "id", "text", n_buckets=64)
    joined = pred.join(docs, pred.id == docs.id).select("pred", "lang")
    acc = joined.filter("pred = lang").count() / joined.count()
    assert acc == 1.0  # markers are unambiguous at 64 buckets / 3 labels


def test_empty_doc_scores_prior_only(spark):
    docs = spark.createDataFrame(
        [(1, "a", "w w w"), (2, "b", "v"), (3, "a", "")],
        "id long, lang string, text string",
    )
    model = nb_train(docs.filter("id <= 2"), "id", "text", "lang", n_buckets=8)
    out = {r.id: r for r in nb_classify(docs, model, "id", "text",
                                        n_buckets=8).collect()}
    assert set(out) == {1, 2, 3}
    lg = lambda v: math.floor(FXP * math.log2(v))
    # doc 3 has no tokens: best prior wins; 'a' has 1 of 2 docs, tie with
    # 'b' broken by label asc -> 'a', score = lg(1)-lg(2)
    assert out[3].pred == "a" and out[3].score_fxp == lg(1) - lg(2)


def test_plans_no_window_no_python_broadcast_model(spark):
    docs = _corpus(spark)
    model = nb_train(docs, "id", "text", "lang", n_buckets=32)
    for df in (model, nb_classify(docs, model, "id", "text", n_buckets=32)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "BatchEvalPython" not in plan
    cls_plan = (
        nb_classify(docs, model, "id", "text", n_buckets=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in cls_plan


def test_null_text_scores_prior_only_like_oracle(spark):
    # Regression: NULL text must behave like empty text (prior-only
    # prediction).  explode(NULL) yields no feature rows and
    # size(NULL) is -1 (never 0), so the old `size == 0` empty branch
    # silently dropped NULL-text docs while the DuckDB oracle's NOT-IN
    # branch kept them.
    docs = spark.createDataFrame(
        [(1, "a", "w w w"), (2, "b", "v"), (3, "a", None)],
        "id long, lang string, text string",
    )
    model = nb_train(docs.filter("id <= 2"), "id", "text", "lang", n_buckets=8)
    out = {r.id: r for r in nb_classify(docs, model, "id", "text",
                                        n_buckets=8).collect()}
    assert set(out) == {1, 2, 3}
    lg = lambda v: math.floor(FXP * math.log2(v))
    assert out[3].pred == "a" and out[3].score_fxp == lg(1) - lg(2)


def test_active_select_surfaces_ambiguous_docs(spark):
    from biothings_crawler_spark.operators.nbayes import (
        active_select,
        nb_train,
    )

    # two sharply separable classes plus docs mixing both markers --
    # the mixed docs are the ambiguous ones margin sampling must
    # surface first
    rows = []
    for i in range(40):
        rows.append((i, "a", "alpha alpha alpha filler%d" % (i % 7)))
    for i in range(40, 80):
        rows.append((i, "b", "beta beta beta filler%d" % (i % 7)))
    mixed = [(100 + j, "a", "alpha beta filler%d" % j) for j in range(6)]
    df = spark.createDataFrame(rows + mixed,
                               "doc_id long, lang string, text string")
    model = nb_train(df.filter("doc_id < 80"), "doc_id", "text", "lang",
                     n_buckets=64)
    got = active_select(df, model, "doc_id", "text", n_buckets=64, k=5)
    sel = got.collect()
    assert all(r["rank"] <= 5 for r in sel)
    # every mixed doc that got selected outranks (smaller margin than)
    # every pure doc selected in the same class
    by_pred = {}
    for r in sel:
        by_pred.setdefault(r["pred"], []).append(r)
    mixed_ids = {100 + j for j in range(6)}
    for pred, rs in by_pred.items():
        mixed_margins = [r["margin_fxp"] for r in rs if r["id"] in mixed_ids]
        pure_margins = [r["margin_fxp"] for r in rs
                        if r["id"] not in mixed_ids]
        if mixed_margins and pure_margins:
            assert max(mixed_margins) <= min(pure_margins)
    # at least some mixed docs were surfaced at the top of a class
    tops = [r for r in sel if r["rank"] == 1]
    assert any(r["id"] in mixed_ids for r in tops)
