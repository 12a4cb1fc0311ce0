"""PDF text extraction (operators/pdftext): real structure-following
parse — trailer/Root/Pages/Kids navigation, /Length-sliced Flate
streams, Tj/TJ scanning with escape handling."""


import pytest

from biothings_crawler_spark.operators.pdftext import (
    _build_pdf,
    decode_pdf_text,
    extract_pdf_text,
    fixture_lines,
    gen_pdf_media_seeded,
)


def test_roundtrip_all_lane_combos():
    for seed in range(30):
        pages = fixture_lines(seed)
        pdf = _build_pdf(pages, flate=seed % 2 == 0,
                         reverse_objects=seed % 5 == 0,
                         tj_arrays=seed % 3 == 1)
        np_, text, nc = extract_pdf_text(pdf)
        want = "\f".join("\n".join(ls) for ls in pages)
        assert (np_, text, nc) == (len(pages), want, len(want))


def test_kids_order_wins_over_object_order():
    """Pages must come back in /Kids order even when the content
    objects are emitted in reverse — the linear-scan casualty lane."""
    pages = [["first page"], ["second page"], ["third page"]]
    fwd = extract_pdf_text(_build_pdf(pages, flate=True,
                                      reverse_objects=False,
                                      tj_arrays=False))
    rev = extract_pdf_text(_build_pdf(pages, flate=True,
                                      reverse_objects=True,
                                      tj_arrays=False))
    assert fwd == rev == (3, "first page\fsecond page\fthird page", 33)


def test_escapes_and_octal():
    pages = [["a(b)c\\d"]]
    pdf = _build_pdf(pages, flate=False, reverse_objects=False,
                     tj_arrays=False)
    assert extract_pdf_text(pdf)[1] == "a(b)c\\d"
    # hand-built octal + \n escapes inside a plain stream
    payload = b"BT (\\101\\12\\051) Tj ET"
    body = (b"<< /Length %d >>\nstream\n" % len(payload)) + payload \
        + b"\nendstream"
    doc = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n" + body + b"\nendobj\n"
           b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF")
    assert extract_pdf_text(doc)[1] == "A\n)"


def test_tj_kern_numbers_concatenate_exactly():
    """TJ arrays reassemble with NO injected spaces at kern gaps."""
    pages = [["abcdefgh ij"]]
    pdf = _build_pdf(pages, flate=True, reverse_objects=False,
                     tj_arrays=True)
    assert extract_pdf_text(pdf)[1] == "abcdefgh ij"


def test_length_slicing_survives_endstream_in_data():
    """The bytes 'endstream' inside Flate data must not truncate the
    stream — /Length is authoritative."""
    # a PLAIN stream whose payload contains the literal bytes
    # "endstream" inside a shown string: a search-based parser
    # truncates mid-string, /Length slicing does not
    payload = b"BT (before endstream after) Tj ET"
    body = (b"<< /Length %d >>\nstream\n" % len(payload)
            + payload + b"\nendstream")
    doc = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n" + body + b"\nendobj\n"
           b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF")
    assert extract_pdf_text(doc)[1] == "before endstream after"


def test_unsupported_features_raise_into_decode_err(spark):
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(1, 4), (2, 7), (3, 9)],
                                "media_id long, seed long")
    media = gen_pdf_media_seeded(ids)
    media = media.withColumn(
        "content",
        F.when(F.col("media_id") == 3,
               F.lit(b"%PDF-1.5 broken")).otherwise(F.col("content")))
    out = {r.media_id: r for r in decode_pdf_text(media).collect()}
    assert out[3].decode_err is not None and out[3].text is None
    for mid in (1, 2):
        assert out[mid].decode_err is None
        assert out[mid].n_chars == len(out[mid].text)
    # unsupported filter is an error, not silence
    with pytest.raises(ValueError, match="unsupported filter"):
        body = (b"<< /Length 4 /Filter /LZWDecode >>\nstream\nabcd"
                b"\nendstream")
        doc = (b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\n"
               b"endobj\n2 0 obj\n<< /Type /Pages /Kids [3 0 R] "
               b"/Count 1 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
               b"4 0 obj\n" + body + b"\nendobj\n"
               b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF")
        extract_pdf_text(doc)


def test_plan_is_single_map_stage(spark):
    ids = spark.createDataFrame([(1, 4)], "media_id long, seed long")
    plan = decode_pdf_text(gen_pdf_media_seeded(ids)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # pure map: no shuffle anywhere
