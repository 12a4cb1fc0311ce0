"""GIF87a / LZW codec (operators/gifcodec) + the Spark decode stage."""

import random

import pytest

from biothings_crawler_spark.operators.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    gif_decode_gray,
    gif_encode_gray,
)


def test_structured_roundtrip():
    w, h = 23, 17
    pix = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    assert gif_decode_gray(gif_encode_gray(pix, w, h)) == (w, h, pix)


def test_random_roundtrip_exercises_table_reset():
    rnd = random.Random(0)
    pix = bytes(rnd.randrange(256) for _ in range(120 * 80))
    # incompressible input grows the dictionary to the 12-bit cap,
    # forcing at least one encoder CLEAR reset
    data = gif_encode_gray(pix, 120, 80)
    assert gif_decode_gray(data)[2] == pix


def test_kwkwk_case():
    # 'ababab...' over a tiny alphabet drives the code==len(table)
    # branch (decoder sees a code it has not yet defined)
    pix = bytes([1, 2] * 512)
    enc = _lzw_encode(pix, 2)
    assert _lzw_decode(enc, 2) == pix


def test_repetitive_compresses():
    pix = ((b"\x05" * 997 + b"\x09\x05\x09" * 331) * 3)[:80 * 50]
    data = gif_encode_gray(pix, 80, 50)
    assert len(data) < len(pix)
    assert gif_decode_gray(data)[2] == pix


def test_decoder_skips_extension_blocks():
    pix = bytes(range(16))
    data = bytearray(gif_encode_gray(pix, 4, 4))
    # splice a GCE extension (0x21 0xF9, 4-byte block, terminator)
    # right before the image descriptor: header 13 + GCT 768 bytes
    i = 13 + 768
    assert data[i] == 0x2C
    data[i:i] = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00])
    assert gif_decode_gray(bytes(data))[2] == pix


def test_decoder_rejects_interlace_and_garbage():
    pix = bytes(range(16))
    data = bytearray(gif_encode_gray(pix, 4, 4))
    i = 13 + 768
    assert data[i] == 0x2C
    data[i + 9] |= 0x40  # set the interlace flag
    with pytest.raises(NotImplementedError):
        gif_decode_gray(bytes(data))
    with pytest.raises(ValueError):
        gif_decode_gray(b"JFIF not a gif")


def test_spark_decode_stage_matches_closed_form(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        decode_gif_features,
        gen_gif_media,
    )

    ids = spark.range(10).select(F.col("id").alias("media_id"))
    got = {r["media_id"]: r for r in
           decode_gif_features(gen_gif_media(ids)).collect()}
    for mid in range(10):
        w, h = 4 + mid % 5, 3 + mid % 4
        pix = [(mid * 29 + y * 11 + x * 5) % 256
               for y in range(h) for x in range(w)]
        r = got[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_gray"] == sum(pix)
        assert (r["min_gray"], r["max_gray"]) == (min(pix), max(pix))
