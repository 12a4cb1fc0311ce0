"""ExactSubstr duplicated-span detection + removal (operators/substr)."""

from biothings_crawler_spark.operators.substr import (
    duplicated_spans,
    strip_spans,
)

DUP = "0123456789abcdefghij"  # exactly L=20 — one duplicated window


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_span_and_short_doc_skipped(spark):
    docs = _docs(spark, [
        (1, "AAAA" + DUP + "BBBBBBBBBBBBBBBBBBBB"),
        (2, "CCCCCC" + DUP + "DDDDDDDDDDDDDDDDDD"),
        (3, "tiny"),  # shorter than L: no windows, no descending-sequence blowup
    ])
    spans = {(r.doc_id, r.span_start, r.span_end, r.span_len)
             for r in duplicated_spans(docs, min_len=20).collect()}
    assert spans == {(1, 4, 24, 20), (2, 6, 26, 20)}


def test_intra_doc_repeat_merges(spark):
    # The 40-char block repeats inside one doc: every window inside each
    # copy is duplicated, so each copy merges to ONE maximal 40-char span.
    block = "x" * 7 + DUP + "y" * 13  # 40 chars, internally unique windows
    docs = _docs(spark, [(7, block + "-----SEP-----" + block)])
    got = sorted((r.span_start, r.span_end)
                 for r in duplicated_spans(docs, min_len=20).collect())
    assert got == [(0, 40), (53, 93)]


def test_strip_spans_cuts_and_counts(spark):
    docs = _docs(spark, [
        (1, "AAAA" + DUP + "BBBBBBBBBBBBBBBBBBBB"),
        (2, "CCCCCC" + DUP + "DDDDDDDDDDDDDDDDDD"),
        (3, "no duplicates here at all, long enough text"),
    ])
    spans = duplicated_spans(docs, min_len=20)
    out = {r.doc_id: (r.text_clean, r.n_spans)
           for r in strip_spans(docs, spans).collect()}
    assert out[1] == ("AAAA" + "B" * 20, 1)
    assert out[2] == ("CCCCCC" + "D" * 18, 1)
    assert out[3] == ("no duplicates here at all, long enough text", 0)


def test_strip_whole_doc(spark):
    docs = _docs(spark, [(1, DUP), (2, DUP)])
    out = {r.doc_id: (r.text_clean, r.n_spans)
           for r in strip_spans(docs, duplicated_spans(docs, min_len=20)).collect()}
    assert out == {1: ("", 1), 2: ("", 1)}


def test_md5_hash_family_matches_xxhash_path(spark):
    docs = _docs(spark, [
        (1, "AAAA" + DUP + "BBBBBBBBBBBBBBBBBBBB"),
        (2, "CCCCCC" + DUP + "DDDDDDDDDDDDDDDDDD"),
    ])
    a = sorted(map(tuple, duplicated_spans(docs, min_len=20).collect()))
    b = sorted(map(tuple, duplicated_spans(
        docs, min_len=20, hash_family="md5").collect()))
    assert a == b


def test_suffix_array_matches_sorted_suffixes(spark):
    from biothings_crawler_spark.operators.substr import suffix_array

    docs = [(1, "banana"), (2, "ban"), (3, ""), (4, "abracadabra"),
            (5, "banana")]  # exact duplicate doc -> long cross-doc LCPs
    df = spark.createDataFrame(docs, "id long, text string")
    got = {r["pos"]: r["rank"] for r in suffix_array(df).collect()}
    S = "".join(t + "\x01" for _, t in docs)
    ref = {p: rk for rk, p in enumerate(
        sorted(range(1, len(S) + 1), key=lambda i: S[i - 1:]), 1)}
    assert got == ref


def test_suffix_array_unicode_and_inverse(spark):
    from biothings_crawler_spark.operators.substr import suffix_array

    docs = [(1, "日本語 text"), (2, "zz 日本")]
    df = spark.createDataFrame(docs, "id long, text string")
    rows = suffix_array(df).collect()
    got = {r["pos"]: r["rank"] for r in rows}
    S = "".join(t + "\x01" for _, t in docs)
    ref = {p: rk for rk, p in enumerate(
        sorted(range(1, len(S) + 1), key=lambda i: S[i - 1:]), 1)}
    assert got == ref
    # ranks are a permutation of 1..n (a valid inverse SA)
    assert sorted(got.values()) == list(range(1, len(S) + 1))
