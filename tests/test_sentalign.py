"""Gale-Church sentence alignment (operators/sentalign vs the frozen
oracle implementation in oracle/galechurch)."""

from biothings_crawler_spark.oracle import galechurch as gc
from biothings_crawler_spark.operators.sentalign import (
    _align_iterative,
    gale_church_align,
)


def test_one_to_one_identity():
    lens = [20, 25, 30]
    beads = _align_iterative(lens, lens)
    assert beads == [(0, 1, 0, 1, 0), (1, 2, 1, 2, 0), (2, 3, 2, 3, 0)]


def test_merge_and_expansion_beads():
    # tgt merges src sentences 0+1 into one; the 15-char tail is
    # cheaper absorbed into a 1-2 bead (230 + |30-45|*1000//76 = 427)
    # than as a separate 0-1 insertion (450 + ~937) — the surrogate
    # length term punishes empty-side beads hard, like the paper's
    # Gaussian does
    src = [20, 22, 30]
    tgt = [42, 30, 15]
    beads = _align_iterative(src, tgt)
    assert beads == [(0, 2, 0, 1, 230), (2, 3, 1, 3, 427)]
    # 2-1 penalty 230 + zero length term (|42-42|=0) on the merge bead


def test_iterative_matches_frozen_recursion_on_fixture():
    for row in gc.fixture_rows(60):
        sl = [len(x) for x in gc.split_sentences(row["src_text"])]
        tl = [len(x) for x in gc.split_sentences(row["tgt_text"])]
        assert _align_iterative(sl, tl) == gc.align(sl, tl)


def test_empty_sides_degenerate_beads():
    assert _align_iterative([], [10, 12]) == [
        (0, 0, 0, 1, 450 + gc.length_cost(0, 10)),
        (0, 0, 1, 2, 450 + gc.length_cost(0, 12)),
    ]
    assert _align_iterative([7], []) == [(0, 1, 0, 0, 450 + gc.length_cost(7, 0))]


def test_distributed_matches_oracle(spark):
    rows = gc.fixture_rows(40)
    pairs = spark.createDataFrame(rows)
    got = sorted(
        map(tuple, gale_church_align(pairs).collect())
    )
    want = []
    for r in rows:
        sl = [len(x) for x in gc.split_sentences(r["src_text"])]
        tl = [len(x) for x in gc.split_sentences(r["tgt_text"])]
        for k, (lo, hi, tlo, thi, c) in enumerate(gc.align(sl, tl)):
            want.append((r["src_url"], r["tgt_url"], k, lo, hi, tlo, thi, c))
    assert got == sorted(want)


def test_plan_is_arrow_not_row_python(spark):
    pairs = spark.createDataFrame(gc.fixture_rows(4))
    plan = (
        gale_church_align(pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan  # mapInPandas = Arrow batches


def test_property_random_lengths_agree_and_tile():
    """Property check: on random sentence-length lists the iterative
    table and the frozen recursion emit identical beads, and the beads
    tile [0,n) x [0,m) in order with every bead a legal OPS shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biothings_crawler_spark.oracle.galechurch import OPS

    shapes = {(a, b) for a, b, _ in OPS}
    lens = st.lists(st.integers(1, 80), min_size=0, max_size=9)

    @settings(max_examples=120, deadline=None)
    @given(lens, lens)
    def check(sl, tl):
        got = _align_iterative(sl, tl)
        assert got == gc.align(sl, tl)
        i = j = 0
        for lo, hi, tlo, thi, cost in got:
            assert (lo, tlo) == (i, j)
            assert (hi - lo, thi - tlo) in shapes
            assert cost >= 0
            i, j = hi, thi
        assert (i, j) == (len(sl), len(tl))

    check()
