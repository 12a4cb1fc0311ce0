"""DSIR hashed importance weights (operators/dsir)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dsir import dsir_weights


def _corpus(spark):
    rows = []
    for i in range(40):
        lab = ["en", "de"][i % 2]
        rows.append((i, lab, f"shared filler words t{lab} t{lab} t{lab}"))
    rows.append((99, "en", ""))  # token-free doc
    return spark.createDataFrame(rows, "id long, lang string, text string")


def test_target_like_docs_outrank_and_select(spark):
    docs = _corpus(spark)
    out = dsir_weights(
        docs, docs.filter("lang = 'en'"), "id", "text", n_buckets=64
    )
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 41  # every raw doc scored, including the empty one
    en = [rows[i] for i in range(40) if i % 2 == 0]
    de = [rows[i] for i in range(40) if i % 2 == 1]
    # marker ten tokens put every en doc strictly above every de doc
    assert min(r.w_fxp for r in en) > max(r.w_fxp for r in de)
    assert all(r.selected for r in en)
    # de docs carry a marker absent from target: negative evidence
    assert all(r.w_fxp < 0 and not r.selected for r in de)


def test_empty_doc_zero_weight_unselected(spark):
    docs = _corpus(spark)
    out = dsir_weights(
        docs, docs.filter("lang = 'en'"), "id", "text", n_buckets=64
    )
    r = out.filter("id = 99").collect()[0]
    assert r.n_tokens == 0 and r.w_fxp == 0 and not r.selected


def test_target_equals_raw_is_zero_everywhere(spark):
    # identical distributions: every bucket log-ratio is exactly 0
    docs = _corpus(spark).filter("id < 40")
    out = dsir_weights(docs, docs, "id", "text", n_buckets=32)
    assert out.filter("w_fxp != 0").count() == 0


def test_plan_broadcast_ratio_no_window_no_python(spark):
    docs = _corpus(spark)
    out = dsir_weights(
        docs, docs.filter("lang = 'en'"), "id", "text", n_buckets=32
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
