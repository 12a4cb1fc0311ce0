"""Frozen pure-Python Gale-Church sentence aligner — the golden oracle
for ``operators/sentalign.gale_church_align``.

Spec shared by both implementations (documented here, implemented twice
— recursively with memoization here, iteratively in the operator — so
the driver-gate equality is a genuine cross-implementation check):

* Sentences split on ``(?<=[.!?])\\s+`` (fixed-width lookbehind,
  identical under Java and Python ``re``); sentence length = character
  count of the split fragment.
* Bead operations and integer match penalties from Gale & Church
  (CL 1993, table of -100·log2 prior costs): 1-1 → 0, 1-0/0-1 → 450,
  2-1/1-2 → 230, 2-2 → 440.
* The paper's Gaussian length term is replaced by the exact-rational
  surrogate ``d(ls, lt) = |ls - lt| * 1000 // (ls + lt + 1)`` over the
  summed character lengths of each side of the bead — monotone in
  relative length mismatch, integer-exact, so the distributed engine
  and this oracle are bit-identical with no float in sight.
* Bead cost = penalty + d; alignment = the bead sequence minimizing
  total cost; ties broken by preferring the EARLIER operation in the
  order (1-1, 1-0, 0-1, 2-1, 1-2, 2-2) at every DP cell.
"""

from __future__ import annotations

import re
from functools import lru_cache

SENT_SPLIT_RE = r"(?<=[.!?])\s+"

# (n src sentences consumed, n tgt sentences consumed, match penalty)
OPS: tuple[tuple[int, int, int], ...] = (
    (1, 1, 0),
    (1, 0, 450),
    (0, 1, 450),
    (2, 1, 230),
    (1, 2, 230),
    (2, 2, 440),
)


def split_sentences(text: str) -> list[str]:
    return [s for s in re.split(SENT_SPLIT_RE, text or "") if s]


def length_cost(ls: int, lt: int) -> int:
    return abs(ls - lt) * 1000 // (ls + lt + 1)


def align(src_lens: list[int], tgt_lens: list[int]) -> list[tuple[int, int, int, int, int]]:
    """Minimal-cost bead sequence as ``[(src_lo, src_hi, tgt_lo,
    tgt_hi, bead_cost), ...]`` (half-open spans, in order).  Recursive
    with memoization — deliberately a different implementation shape
    from the operator's iterative table."""
    n, m = len(src_lens), len(tgt_lens)

    @lru_cache(maxsize=None)
    def best(i: int, j: int) -> tuple[int, tuple[int, int, int] | None]:
        """(min total cost of aligning src[:i] with tgt[:j], last op)."""
        if i == 0 and j == 0:
            return 0, None
        winner = None
        for a, b, pen in OPS:
            if i - a < 0 or j - b < 0:
                continue
            prev, _ = best(i - a, j - b)
            bead = pen + length_cost(sum(src_lens[i - a:i]),
                                     sum(tgt_lens[j - b:j]))
            total = prev + bead
            if winner is None or total < winner[0]:
                winner = (total, (a, b, pen))
        assert winner is not None
        return winner

    beads: list[tuple[int, int, int, int, int]] = []
    i, j = n, m
    while i > 0 or j > 0:
        _, op = best(i, j)
        assert op is not None
        a, b, pen = op
        bead = pen + length_cost(sum(src_lens[i - a:i]), sum(tgt_lens[j - b:j]))
        beads.append((i - a, i, j - b, j, bead))
        i, j = i - a, j - b
    best.cache_clear()
    return list(reversed(beads))


def fixture_rows(n_pairs: int = 120) -> list[dict]:
    """Deterministic aligned-document pairs (shared INPUT of the golden
    generator and the Spark query; the implementations differ).  Source
    docs have 4 + g%4 sentences with lengths 20 + ((7g + 13i) % 30);
    target docs start as a 1-1 copy and then, per pair: g%5 merges the
    first two source sentences into one target sentence (a 2-1 bead),
    g%7 appends a surplus 15-char target sentence, g%11 drops the last
    target sentence — the DP decides whether surplus/deficit ends ride
    0-1/1-0 beads or get absorbed into 1-2/2-1 neighbors (the cheap
    direction under the exact-rational length term)."""
    rows = []
    for g in range(n_pairs):
        ns = 4 + g % 4
        src_lens = [20 + ((7 * g + 13 * i) % 30) for i in range(ns)]
        src = ["a" * (L - 1) + "." for L in src_lens]
        tgt = list(src)
        if g % 5 == 0 and len(tgt) >= 2:
            tgt = ["b" * (src_lens[0] + src_lens[1] - 1) + "."] + tgt[2:]
        if g % 11 == 0 and tgt:
            tgt = tgt[:-1]
        if g % 7 == 0:
            tgt = tgt + ["c" * 14 + "."]
        rows.append({
            "src_url": f"https://en.site{g}.example/d/{g}",
            "tgt_url": f"https://de.site{g}.example/d/{g}",
            "src_text": " ".join(src),
            "tgt_text": " ".join(tgt),
        })
    return rows
