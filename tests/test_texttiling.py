"""TextTiling segmentation (operators/texttiling) vs a brute-force
reference and on planted-topic fixtures."""

import random

from biothings_crawler_spark.operators.texttiling import texttiling


def _brute(text, w, k):
    """Independent plain-Python reference (dict counts + while-loop
    peak climbing — a different shape from the operator's aggs)."""
    ws = [x for x in text.lower().split() if x]
    n = len(ws)
    if n <= w:
        return []
    P = (n + w - 1) // w
    blocks = [ws[p * w:(p + 1) * w] for p in range(P)]

    def cnts(ps):
        d = {}
        for p in ps:
            for t in blocks[p]:
                d[t] = d.get(t, 0) + 1
        return d

    scores = []
    for i in range(1, P):
        L = cnts(range(max(0, i - k), i))
        R = cnts(range(i, min(P, i + k)))
        dot = sum(c * R.get(t, 0) for t, c in L.items())
        l2l = sum(c * c for c in L.values())
        l2r = sum(c * c for c in R.values())
        scores.append(dot * dot * 10**6 // (l2l * l2r))
    m = len(scores)
    ds = []
    for j in range(m):
        lo = j
        while lo > 0 and scores[lo - 1] >= scores[lo]:
            lo -= 1
        hi = j
        while hi < m - 1 and scores[hi + 1] >= scores[hi]:
            hi += 1
        ds.append(scores[lo] + scores[hi] - 2 * scores[j])
    sd, sd2 = sum(ds), sum(x * x for x in ds)
    out = []
    for j in range(m):
        b = 2 * sd - 2 * m * ds[j]
        isb = b < 0 or (m * sd2 - sd * sd) > b * b
        out.append((j + 1, (j + 1) * w, scores[j], ds[j], isb))
    return out


def _run(spark, docs, w, k):
    df = spark.createDataFrame(docs, "id long, t string")
    return sorted(
        (r["id"], r["gap"], r["pos"], r["score_ppm"], r["depth"],
         r["is_boundary"])
        for r in texttiling(df, "id", "t", w=w, k=k).collect()
    )


def test_matches_reference_on_random_docs(spark):
    rng = random.Random(17)
    vocab = ["cat", "dog", "run", "eat", "sky", "sea", "oak", "ant"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 90))))
        for i in range(40)
    ]
    got = _run(spark, docs, 7, 2)
    want = sorted(
        (i, *row) for i, t in docs for row in _brute(t, 7, 2))
    assert got == want


def test_planted_topic_shift_is_the_boundary(spark):
    t = ("cat dog fish bird " * 10).strip() + " " + \
        ("qux zap mop lid " * 10).strip()
    rows = _run(spark, [(1, t)], 10, 2)
    # vocabulary-disjoint halves: the junction gap (token 40 -> gap 4)
    # scores 0 cohesion and takes the maximal depth
    best = max(rows, key=lambda r: r[4])
    assert best[1] == 4 and best[3] == 0 and best[5] is True
    # a perfectly uniform doc never segments: identical blocks ->
    # equal scores -> zero depth -> sigma 0 and depth = mean, which
    # must NOT clear the strict "depth > mu - sigma/2" cutoff
    uni = _run(spark, [(2, "alpha " * 40)], 10, 2)
    assert uni and all(not r[5] for r in uni)
    assert all(r[3] == 10**6 and r[4] == 0 for r in uni)


def test_short_docs_emit_nothing(spark):
    assert _run(spark, [(1, "only five words in here")], 10, 2) == []


def test_plan_shape(spark):
    df = spark.createDataFrame([(1, "a b " * 30)], "id long, t string")
    plan = texttiling(df, "id", "t")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def _brute_chunks(text, w, k, max_tokens):
    tiles = _brute(text, w, k)
    ws = [x for x in text.lower().split() if x]
    n = len(ws)
    if n <= w:
        return []
    P = (n + w - 1) // w
    s = max(1, max_tokens // w)
    cuts = [0] + [g for g, _, _, _, isb in tiles if isb] + [P]
    out, cid = [], 0
    for si in range(len(cuts) - 1):
        lo = cuts[si]
        while lo < cuts[si + 1]:
            hi = min(lo + s, cuts[si + 1])
            tlo, thi = lo * w, min(hi * w, n)
            out.append((si, cid, tlo, thi, thi - tlo))
            cid += 1
            lo = hi
    return out


def test_topic_chunks_match_reference(spark):
    from biothings_crawler_spark.operators.texttiling import topic_chunks

    rng = random.Random(23)
    vocab = ["cat", "dog", "run", "eat", "sky", "sea", "oak", "ant"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 90))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "id long, t string")
    got = sorted(
        (r["id"], r["seg_id"], r["chunk_id"], r["tok_lo"], r["tok_hi"],
         r["n_tokens"])
        for r in topic_chunks(df, "id", "t", w=7, k=2,
                              max_tokens=21).collect())
    want = sorted((i, *row) for i, t in docs
                  for row in _brute_chunks(t, 7, 2, 21))
    assert got == want


def test_topic_chunks_respect_boundaries_and_budget(spark):
    from biothings_crawler_spark.operators.texttiling import (
        texttiling,
        topic_chunks,
    )

    t = ("cat dog fish bird " * 10).strip() + " " + \
        ("qux zap mop lid " * 10).strip()
    df = spark.createDataFrame([(1, t)], "id long, t string")
    rows = sorted(
        (r["chunk_id"], r["seg_id"], r["tok_lo"], r["tok_hi"],
         r["n_tokens"])
        for r in topic_chunks(df, "id", "t", w=10, k=2,
                              max_tokens=30).collect())
    # budget holds, coverage is exact and contiguous
    assert all(r[4] <= 30 for r in rows)
    assert rows[0][2] == 0 and rows[-1][3] == 80
    for a, b in zip(rows, rows[1:]):
        assert b[2] == a[3]
    # every tiling boundary is a chunk edge
    bounds = {r["pos"] for r in texttiling(df, "id", "t", 10, 2).collect()
              if r["is_boundary"]}
    edges = {r[2] for r in rows} | {r[3] for r in rows}
    assert bounds <= edges
    # segments change exactly at the planted topic junction (token 40)
    seg_at = {r[2]: r[1] for r in rows}
    assert 40 in bounds and seg_at[40] > seg_at[0]
