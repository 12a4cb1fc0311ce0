"""BPE merge training: the Spark loop must match an independent
pure-Python trainer (counts, tie-breaks, greedy merge application
including the overlapping-pair case) on the corpus word table."""

from collections import Counter

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.bpe import (
    apply_merge_col,
    bpe_train,
    word_counts,
)


def _ref_bpe(wc, n):
    state = {w: list(w) + ["$"] for w in wc}
    merges = []
    for k in range(n):
        cnt = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                cnt[(a, b)] += wc[w]
        if not cnt:
            break
        (a, b), c = sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((k, a, b, c))
        for w, toks in state.items():
            out, prev = [], ""
            for t in toks:
                if prev == a and t == b:
                    prev = a + b
                elif prev == "":
                    prev = t
                else:
                    out.append(prev)
                    prev = t
            if prev:
                out.append(prev)
            state[w] = out
    return merges, {w: " ".join(t) for w, t in state.items()}


def test_bpe_train_matches_reference(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = word_counts(docs, "text")
    wc = {r["w"]: r["weight"] for r in words.collect()}
    merges, seg = bpe_train(spark, words, n_merges=6)
    ref_merges, ref_seg = _ref_bpe(wc, 6)
    assert merges == ref_merges
    got = {r["w"]: r["seq"] for r in seg.collect()}
    assert got == ref_seg


def test_apply_merge_is_greedy_left_to_right(spark):
    cases = [
        ("x x x x", "x", "x", "xx xx"),     # no overlapping middle pair
        ("a b a b", "a", "b", "ab ab"),
        ("a a b", "a", "b", "a ab"),
        ("a b b", "a", "b", "ab b"),
        ("q", "a", "b", "q"),
        ("a b", "a", "b", "ab"),
    ]
    df = spark.createDataFrame(
        [(i, s, a, b) for i, (s, a, b, _) in enumerate(cases)],
        "i int, s string, a string, b string")
    got = {r["i"]: r["m"] for r in df.select(
        "i", apply_merge_col(F.col("s"), F.col("a"), F.col("b"))
        .alias("m")).collect()}
    for i, (_s, _a, _b, exp) in enumerate(cases):
        assert got[i] == exp, (i, got[i], exp)
