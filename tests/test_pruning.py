"""Static impact-ordered index pruning (operators/bm25.prune_postings_topn)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.bm25 import (
    bm25_term_scores,
    bm25_topk,
    prune_postings_topn,
    pruned_topk,
)


def _corpus(spark, n=80):
    rows = []
    for i in range(n):
        # every doc matches 'data'; high-tf signal docs every 8th
        body = "data " * (4 if i % 8 == 0 else 1) + "filler " * (i % 5 + 1)
        rows.append((i, body))
    return spark.createDataFrame(rows, "id long, text string")


def test_prune_keeps_exact_topn_per_term(spark):
    docs = _corpus(spark)
    scored = bm25_term_scores(docs, "id", "text", ["data", "filler"])
    pruned = prune_postings_topn(scored, keep_n=10, salt_target=3)
    # forced multi-salt phase 1 (salt_target=3 over ~80 postings) must
    # still produce the exact global top-10 per term
    expect = {
        t: [r.id for r in scored.filter(scored.term == t)
            .orderBy(F.desc("term_score"), "id").limit(10).collect()]
        for t in ("data", "filler")
    }
    got = {
        t: [r.id for r in pruned.filter(pruned.term == t)
            .orderBy(F.desc("term_score"), "id").collect()]
        for t in ("data", "filler")
    }
    assert got == expect
    assert pruned.groupBy("term").count().agg(F.max("count")).first()[0] == 10


def test_pruned_index_is_smaller_but_topk_overlaps(spark):
    docs = _corpus(spark)
    scored = bm25_term_scores(docs, "id", "text", ["data"])
    full_n = scored.count()
    pruned_n = prune_postings_topn(scored, keep_n=20).count()
    assert pruned_n == 20 < full_n
    full = [r.id for r in bm25_topk(docs, "id", "text", ["data"], k=10).collect()]
    pr = [r.id for r in
          pruned_topk(docs, "id", "text", ["data"], keep_n=20, k=10).collect()]
    # keep_n=20 >> k=10: the head of the ranking survives pruning intact
    assert pr == full


def test_plan_no_unsalted_giant_window(spark):
    docs = _corpus(spark)
    scored = bm25_term_scores(docs, "id", "text", ["data"])
    plan = (
        prune_postings_topn(scored, keep_n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    # both phases present: (term, salt) window then term window
    assert plan.count("Window") >= 2


def test_frontcoding_hand_computed(spark):
    from biothings_crawler_spark.operators.bm25 import (
        dictionary_frontcoding_report,
    )

    postings = spark.createDataFrame(
        [("prefix", 1, 1), ("prefixes", 1, 1), ("prefixing", 2, 1),
         ("zz", 1, 1)],
        "term string, id long, tf long",
    )
    out = {(r.pfx, r.block_no): r for r in
           dictionary_frontcoding_report(postings, block=16).collect()}
    pr = out[("pr", 0)]
    # head 'prefix' = 1+6; 'prefixes' lcp 6 -> 2+8-6; 'prefixing'
    # lcp 6 vs PREVIOUS ('prefixes': prefix + e vs i mismatch) -> 2+9-6
    assert pr.n_terms == 3
    assert pr.raw_bytes == (1 + 6) + (1 + 8) + (1 + 9)
    assert pr.packed_bytes == 7 + 4 + 5
    assert pr.savings_ppm == (26 - 16) * 1_000_000 // 26
    zz = out[("zz", 0)]
    assert zz.packed_bytes == zz.raw_bytes == 3  # lone head, no sharing


def test_frontcoding_blocks_restart(spark):
    from biothings_crawler_spark.operators.bm25 import (
        dictionary_frontcoding_report,
    )

    rows = [(f"aa{i:03d}", 1, 1) for i in range(20)]
    postings = spark.createDataFrame(rows, "term string, id long, tf long")
    out = {r.block_no: r for r in
           dictionary_frontcoding_report(postings, block=16).collect()}
    assert out[0].n_terms == 16 and out[1].n_terms == 4
    # block 1's head is stored FULL even though it shares 'aa0'
    assert out[1].packed_bytes == (1 + 5) + 3 * (2 + 5 - 4)
