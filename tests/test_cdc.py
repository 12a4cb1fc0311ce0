"""Gear-hash content-defined chunking: the Spark expression fold must
match an independent pure-Python walk of the same recipe, and the
boundaries must exhibit CDC's defining property — realignment after a
prefix edit."""

import hashlib

from biothings_crawler_spark.operators.cdc import GEAR, MOD48, cdc_chunks


def _ref_chunks(text, mask=0x1F, mn=8, mx=128):
    h, last, cuts = 0, 0, []
    for i in range(1, len(text) + 1):
        h = (h * 2 + GEAR[ord(text[i - 1]) % 256]) % MOD48
        if (i - last >= mn and (h & mask) == 0) or (i - last >= mx):
            cuts.append(i)
            last = i
    if not text:
        return []
    if last != len(text):
        cuts.append(len(text))
    out, prev = [], 0
    for k, end in enumerate(cuts):
        s = prev + 1
        chunk = text[s - 1:end]
        out.append((k, s, end - s + 1,
                    hashlib.md5(chunk.encode()).hexdigest()))
        prev = end
    return out


BASE = "the quick brown fox jumps over the lazy dog " * 6


def test_cdc_matches_reference(spark):
    texts = [
        BASE,
        "a" * 145,            # no mask hits -> max-size forced cuts
        "short", "x" * 8, "",
        "prefix edit: " + BASE,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    got = {}
    for r in cdc_chunks(df, "id", "text").collect():
        got.setdefault(r["id"], []).append(
            (r["chunk_no"], r["start"], r["chunk_len"], r["chunk_md5"]))
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == _ref_chunks(t), i


def test_cdc_udf_matches_expression_fold(spark):
    """The numpy cuts kernel must equal the expression fold row for
    row — including unicode codepoints (ascii() = codepoint), forced
    max-size cuts, short/empty/NULL text, and non-default params."""
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.cdc import (
        cdc_boundaries_col,
        make_cdc_cuts_udf,
    )

    texts = [
        BASE,
        "a" * 145,
        "short", "x" * 8, "", None,
        "prefix edit: " + BASE,
        "ünïcødé — ñ π " * 20,          # multibyte codepoints
        "z" * 400,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    for params in ({}, {"mask": 0x7, "min_size": 2, "max_size": 16}):
        got = df.select(
            "id",
            make_cdc_cuts_udf(**params)(F.col("text")).alias("u"),
            F.when(
                F.col("text").isNotNull() & (F.length("text") > 0),
                cdc_boundaries_col(F.col("text"), **params),
            ).otherwise(F.array().cast("array<int>")).alias("e"),
        ).collect()
        for r in got:
            assert list(r["u"]) == list(r["e"]), (params, r["id"])


def test_cdc_realigns_after_prefix_edit():
    h0 = {c[3] for c in _ref_chunks(BASE)}
    h1 = {c[3] for c in _ref_chunks("inserted prefix :: " + BASE)}
    # fixed-size blocks would share nothing after an unaligned insert;
    # CDC must re-share most content-defined chunks
    assert len(h0 & h1) >= len(h0) // 2


def test_cdc_max_size_clamp():
    chunks = _ref_chunks("z" * 400)
    assert all(c[2] <= 128 for c in chunks)
    assert max(c[2] for c in chunks) == 128


def test_delta_storage_unchanged_docs_store_nothing(spark):
    from biothings_crawler_spark.plans.driver_queries import QUERIES

    pdf = QUERIES["q_delta_storage"](
        spark, "/root/testdata/sf0.001").toPandas()
    lane = pdf.doc_id % 5
    unchanged = pdf[lane >= 2]
    edited = pdf[lane <= 1]
    assert (unchanged.new_bytes == 0).all()
    assert (unchanged.n_new_chunks == 0).all()
    # edits must store SOMETHING but far less than a full re-store
    assert edited.new_bytes.sum() > 0
    assert edited.new_bytes.sum() < 0.5 * edited.total_bytes.sum()
