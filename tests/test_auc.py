"""pairwise_auc: rank-sum AUC vs brute-force pair enumeration,
midrank ties, degenerate groups."""

import itertools
import random

from biothings_crawler_spark.operators.serving import pairwise_auc


def brute_auc_ppm(pairs):
    """Reference: mean over (pos, neg) pairs of 1/0.5/0, floored ppm
    via the same integer formula (concordant*2 + ties) * 1e6 // (2*n)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    num = 0
    for p, n in itertools.product(pos, neg):
        num += 2 if p > n else (1 if p == n else 0)
    return num * 1_000_000 // (2 * len(pos) * len(neg))


def test_auc_matches_brute_force(spark):
    rng = random.Random(11)
    rows = []
    for g in range(4):
        for i in range(200):
            s = rng.randrange(0, 20)  # heavy ties
            y = 1 if rng.randrange(0, 25) < s else 0
            rows.append((g, s, y))
    df = spark.createDataFrame(rows, "grp long, score_ppm long, label int")
    got = {r["group"]: r["auc_ppm"]
           for r in pairwise_auc(df).collect()}
    for g in range(4):
        want = brute_auc_ppm([(s, y) for gg, s, y in rows if gg == g])
        assert got[g] == want, (g, got[g], want)
        assert got[g] > 500_000  # score-biased labels must rank


def test_perfect_and_inverted_and_degenerate(spark):
    rows = (
        [(0, i + 10, 1) for i in range(5)] + [(0, i, 0) for i in range(5)]
        + [(1, i, 1) for i in range(5)] + [(1, i + 10, 0) for i in range(5)]
        + [(2, i, 0) for i in range(5)]          # all-negative
        + [(3, 7, 1), (3, 7, 0)]                 # pure tie
    )
    df = spark.createDataFrame(rows, "grp long, score_ppm long, label int")
    got = {r["group"]: r for r in pairwise_auc(df).collect()}
    assert got[0]["auc_ppm"] == 1_000_000
    assert got[1]["auc_ppm"] == 0
    assert got[2]["auc_ppm"] is None
    assert got[2]["n_pos"] == 0 and got[2]["n_neg"] == 5
    assert got[3]["auc_ppm"] == 500_000
