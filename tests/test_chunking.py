"""Sentence-snapped RAG chunking (operators/chunking.rag_chunks)."""

import hashlib
import random
import re

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.chunking import rag_chunks


def _ref_chunks(text, max_tokens, overlap):
    """Plain-Python reference of the greedy fold (independent shape:
    explicit loop over sentences, no prefix tricks)."""
    sents = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text or "")
             if s.strip()]
    tk = [len(s.split()) for s in sents]
    n = len(tk)
    if n == 0:
        return []
    spans, b = [], 0
    for s in range(n):
        if s > b and sum(tk[b:s + 1]) > max_tokens:
            spans.append((b, s - 1))
            b = max(b + 1, s - overlap)
    spans.append((b, n - 1))
    out = []
    for k, (lo, hi) in enumerate(spans):
        ctext = " ".join(sents[lo:hi + 1])
        out.append((k, lo, hi, hi - lo + 1, sum(tk[lo:hi + 1]),
                    len(ctext), hashlib.md5(ctext.encode()).hexdigest()))
    return out


def _rand_doc(rng):
    words, out = ["alpha", "beta", "gamma", "delta", "eps"], []
    for _ in range(rng.randint(1, 60)):
        out.append(rng.choice(words))
        if rng.random() < 0.25:
            out[-1] += rng.choice(".!?")
    return " ".join(out)


def test_matches_reference_on_random_docs(spark):
    rng = random.Random(41)
    docs = [(i, _rand_doc(rng)) for i in range(80)]
    got = {
        (r["id"], r["chunk_id"]): (
            r["sent_lo"], r["sent_hi"], r["n_sents"], r["n_tokens"],
            r["n_chars"], r["chunk_md5"])
        for r in rag_chunks(
            spark.createDataFrame(docs, "id long, t string"),
            "id", "t", max_tokens=9, overlap=2,
        ).collect()
    }
    want = {}
    for i, t in docs:
        for k, lo, hi, ns, nt, nc, h in _ref_chunks(t, 9, 2):
            want[(i, k)] = (lo, hi, ns, nt, nc, h)
    assert got == want


def test_token_bound_and_oversized_own_chunk(spark):
    long_run = " ".join(["w"] * 30)  # no punctuation: one sentence
    df = spark.createDataFrame(
        [(1, "a b c. d e f. g h i. j k l."), (2, long_run)],
        "id long, t string")
    rows = rag_chunks(df, "id", "t", max_tokens=6, overlap=1).collect()
    for r in rows:
        # the bound can only be exceeded by a single run-on sentence
        assert r["n_tokens"] <= 6 or r["n_sents"] == 1
    over = [r for r in rows if r["id"] == 2]
    assert len(over) == 1 and over[0]["n_tokens"] == 30


def test_overlap_and_contiguous_coverage(spark):
    text = " ".join(f"w{i} x{i} y{i}." for i in range(12))
    rows = sorted(
        rag_chunks(
            spark.createDataFrame([(1, text)], "id long, t string"),
            "id", "t", max_tokens=7, overlap=1,
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert rows[0]["sent_lo"] == 0 and rows[-1]["sent_hi"] == 11
    for a, b in zip(rows, rows[1:]):
        assert b["sent_lo"] > a["sent_lo"]          # progress
        assert b["sent_lo"] == a["sent_hi"]         # 1-sentence overlap
        # (2 sentences = 6 tokens fit; the 3rd overflows 7)
        assert a["n_sents"] == 2


def test_row_local_plan_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b. c d. e f.")], "id long, t string")
    plan = rag_chunks(df, "id", "t", 4, 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_heading_outline_sections(spark):
    from biothings_crawler_spark.operators.chunking import (
        _parse_outline,
        heading_chunks,
    )

    html = ("intro text "
            "<h1>Title</h1><p>alpha beta</p>"
            "<h2 class='x'>Sub A</h2><p>gamma</p><div>delta</div>"
            "<h3>Deep</h3>eps"
            "<h2>Sub B</h2>zeta"
            "<h1>Next</h1>eta")
    assert _parse_outline(html) == [
        (0, 0, "", "", 2, "intro text"),
        (1, 1, "", "Title", 2, "alpha beta"),
        (2, 2, "Title", "Sub A", 2, "gamma delta"),
        (3, 3, "Title > Sub A", "Deep", 1, "eps"),
        (4, 2, "Title", "Sub B", 1, "zeta"),
        (5, 1, "", "Next", 1, "eta"),
    ]
    # level skip down and up: h3 directly under h1, then h2 pops it
    assert [r[2] for r in _parse_outline(
        "<h1>A</h1><h3>B</h3>x<h2>C</h2>y")] == ["", "A", "A"]
    # no headings at all -> single preamble section
    assert _parse_outline("<p>just text</p>") == [
        (0, 0, "", "", 2, "just text")]
    assert _parse_outline("") == []
    df = spark.createDataFrame([(1, html), (2, None)], "id long, html string")
    rows = heading_chunks(df).collect()
    assert len(rows) == 6 and all(r["id"] == 1 for r in rows)
    # anchor-wrapped heading is a real boundary with a detagged title
    # (review finding), and script/style contents never reach bodies
    out = _parse_outline(
        "<h1>Top</h1>aaa"
        "<h2><a href=#s>Linked <b>Section</b></a></h2>bbb"
        "<script>var a=1;</script>ccc"
        "<style>.x{color:red}</style>")
    assert out == [
        (0, 1, "", "Top", 1, "aaa"),
        (1, 2, "Top", "Linked Section", 2, "bbb ccc"),
    ]
