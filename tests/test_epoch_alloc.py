"""Data-constrained epoch allocation (operators/sampling.
allocate_epochs): greedy threshold over (source, epoch) units with
decaying repeat value."""

from biothings_crawler_spark.operators.sampling import (
    DEFAULT_EPOCH_DECAY_PPM,
    allocate_epochs,
)


def _run(spark, rows, budget, decay=DEFAULT_EPOCH_DECAY_PPM):
    src = spark.createDataFrame(rows, "source string, tokens long")
    return {(r.source, r.epoch): r
            for r in allocate_epochs(src, budget, decay).collect()}


def test_exact_budget_takes_whole_epochs(spark):
    got = _run(spark, [("a", 100), ("b", 50)], budget=300)
    # epoch tier 1 (both), then tier 2 (both) exactly exhausts 300
    assert got[("a", 1)].status == "full"
    assert got[("b", 1)].status == "full"
    assert got[("a", 2)].status == "full"
    assert got[("b", 2)].status == "full"
    assert got[("a", 3)].tokens_used == 0 and got[("a", 3)].status == "cut"
    assert sum(r.tokens_used for r in got.values()) == 300


def test_partial_boundary_epoch_and_tier_order(spark):
    got = _run(spark, [("a", 100), ("b", 50)], budget=180)
    # tier 1 full (150), then within tier 2 tokens DESC: a gets the
    # remaining 30 as a partial epoch, b is cut
    assert got[("a", 1)].tokens_used == 100
    assert got[("b", 1)].tokens_used == 50
    assert got[("a", 2)].tokens_used == 30
    assert got[("a", 2)].status == "partial"
    assert got[("b", 2)].status == "cut"


def test_utility_is_exact_integer_decay(spark):
    got = _run(spark, [("a", 7)], budget=100)
    for e, ppm in enumerate(DEFAULT_EPOCH_DECAY_PPM, start=1):
        assert got[("a", e)].value_ppm == ppm
        assert got[("a", e)].utility == 7 * ppm // 10**6


def test_greedy_never_skips_a_higher_value_unit(spark):
    """Every taken token has value >= every untaken token's value —
    the threshold property, on a messy fixture."""
    rows = [(f"s{i}", 13 + 7 * i) for i in range(9)]
    got = _run(spark, rows, budget=500)
    taken = [r for r in got.values() if r.tokens_used > 0]
    cut = [r for r in got.values() if r.tokens_used == 0]
    if taken and cut:
        assert min(r.value_ppm for r in taken) >= \
            max(r.value_ppm for r in cut)
    # partial rows: at most one
    assert sum(1 for r in got.values() if r.status == "partial") <= 1
    assert sum(r.tokens_used for r in got.values()) == 500
