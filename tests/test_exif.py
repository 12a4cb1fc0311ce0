"""EXIF extraction (operators/exif): TIFF/IFD walk, both endians,
inline vs offset values, rational exposure, decode_err policy."""

import struct

import pytest

from biothings_crawler_spark.operators.exif import (
    _build_exif_jpeg,
    decode_exif,
    extract_exif,
    gen_exif_media_seeded,
)


def _jpeg(**kw):
    args = dict(make="CamX", model="M1", orientation=6,
                datetime_s="2025:01:02 03:04:00", exposure=(1, 250),
                iso=400, big_endian=False)
    args.update(kw)
    return _build_exif_jpeg(**args)


def test_both_endians_agree():
    a = extract_exif(_jpeg(big_endian=False))
    b = extract_exif(_jpeg(big_endian=True))
    assert a == b == ("CamX", "M1", 6, "2025:01:02 03:04:00", 1, 250, 400)


def test_inline_vs_offset_strings():
    # model <=3 chars + NUL -> inline; longer -> offset-addressed
    assert extract_exif(_jpeg(model="M7"))[1] == "M7"
    assert extract_exif(_jpeg(model="Model9000"))[1] == "Model9000"


def test_rational_exposure_is_exact():
    got = extract_exif(_jpeg(exposure=(10, 1333)))
    assert (got[4], got[5]) == (10, 1333)


def test_marker_scan_skips_other_segments():
    """An APP0 before APP1 must be walked over, not tripped over."""
    base = _jpeg()
    app0 = b"\xff\xe0" + struct.pack(">H", 18) + b"JFIF\x00" + b"\x00" * 11
    doc = base[:2] + app0 + base[2:]
    assert extract_exif(doc) == extract_exif(base)


def test_malformed_goes_to_decode_err(spark):
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(1, 4), (2, 7), (3, 11)],
                                "media_id long, seed long")
    media = gen_exif_media_seeded(ids).withColumn(
        "content",
        F.when(F.col("media_id") == 3,
               F.lit(b"\xff\xd8\xff\xd9")).otherwise(F.col("content")))
    out = {r.media_id: r for r in decode_exif(media).collect()}
    assert out[3].decode_err == "no APP1 Exif segment"
    assert out[3].make is None
    assert out[1].decode_err is None and out[1].iso == 100 * (1 + 4 % 32)
    assert out[2].orientation == 1 + 7 % 8


def test_unsupported_type_raises():
    doc = bytearray(_jpeg())
    # corrupt the orientation entry's type field (entry 3 of IFD0)
    # APP1 starts at 4; TIFF at 4+6(hdr)... find 'II' then IFD0 at +8
    tiff0 = bytes(doc).find(b"II")
    entry3 = tiff0 + 8 + 2 + 2 * 12
    struct.pack_into("<H", doc, entry3 + 2, 11)  # type FLOAT
    with pytest.raises(ValueError, match="unsupported EXIF type"):
        extract_exif(bytes(doc))
