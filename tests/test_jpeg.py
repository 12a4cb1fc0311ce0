"""Baseline JPEG codec (operators/jpegcodec) + the Spark decode stage."""

import numpy as np
import pytest

from biothings_crawler_spark.operators.jpegcodec import (
    _M,
    jpeg_decode_gray,
    jpeg_encode_gray,
)


def test_flat_even_blocks_roundtrip_exact():
    # the documented exactness lane: block-constant EVEN values are
    # pure-DC (DC step 16 divides 8*(v-128) when v is even)
    blocks = np.array([[2 * ((i * 3 + j * 5) % 128) for j in range(2)]
                       for i in range(2)])
    img = np.kron(blocks, np.ones((8, 8), dtype=int)).astype(np.uint8)
    assert np.array_equal(jpeg_decode_gray(jpeg_encode_gray(img)), img)


def test_nonflat_roundtrip_error_bounded():
    g = np.fromfunction(lambda y, x: (y * 7 + x * 3) % 256,
                        (24, 40)).astype(np.uint8)
    d = jpeg_decode_gray(jpeg_encode_gray(g))
    assert d.shape == g.shape
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 12


def test_odd_dimensions_pad_and_crop():
    o = np.full((9, 13), 100, dtype=np.uint8)
    d = jpeg_decode_gray(jpeg_encode_gray(o))
    assert d.shape == (9, 13)
    assert np.array_equal(d, o)


def test_zrl_long_zero_run_roundtrip():
    # a single coefficient at natural (7,7) = the last zigzag slot:
    # 62 zeros precede it, forcing ZRL (run > 15) codes
    F = np.zeros((8, 8))
    F[7, 7] = 200.0
    img = np.clip(np.rint(_M.T @ F @ _M + 128), 0, 255).astype(np.uint8)
    d = jpeg_decode_gray(jpeg_encode_gray(img))
    assert np.array_equal(d, img)


def test_byte_stuffing_survives_roundtrip():
    # seed 3 measurably produces a 0xFF byte in the entropy stream
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    data = jpeg_encode_gray(img)
    assert b"\xff\x00" in data.split(b"\xff\xda")[1]
    d = jpeg_decode_gray(data)
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 12


def test_decoder_rejects_non_baseline():
    img = np.full((8, 8), 100, dtype=np.uint8)
    data = bytearray(jpeg_encode_gray(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg_decode_gray(bytes(data))


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        jpeg_decode_gray(b"not a jpeg")


def test_spark_decode_stage_matches_closed_form(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        decode_jpeg_features,
        gen_jpeg_media,
    )

    ids = spark.range(12).select(F.col("id").alias("media_id"))
    got = {r["media_id"]: r for r in
           decode_jpeg_features(gen_jpeg_media(ids)).collect()}
    for mid in range(12):
        blocks = [2 * ((mid * 37 + by * 2 + bx) % 128)
                  for by in range(2) for bx in range(2)]
        r = got[mid]
        assert (r["width"], r["height"], r["n_pixels"]) == (16, 16, 256)
        assert r["sum_gray"] == 64 * sum(blocks)
        assert r["min_gray"] == min(blocks)
        assert r["max_gray"] == max(blocks)


# --- MJPEG-in-AVI video frame decode ---------------------------------------


def test_avi_roundtrip_frames_and_padding():
    from biothings_crawler_spark.operators.multimodal import (
        _avi_mjpeg_encode,
        _avi_mjpeg_frames,
    )

    # odd-length frame payloads force the RIFF WORD-alignment pad path
    frames = [b"\xff" * 3, b"\xab" * 4, b"\x01"]
    data = _avi_mjpeg_encode(frames)
    assert _avi_mjpeg_frames(data) == frames


def test_avi_rejects_non_avi():
    import pytest as _pytest

    from biothings_crawler_spark.operators.multimodal import (
        _avi_mjpeg_frames,
    )

    with _pytest.raises(ValueError):
        _avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_video_frame_sampling_stride(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        decode_video_frames,
        gen_mjpeg_media,
    )

    ids = spark.range(6).select(F.col("id").alias("media_id"))
    got = decode_video_frames(gen_mjpeg_media(ids), every_n=2).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r["frame_no"])
    for mid, frames in by_id.items():
        n_frames = 3 + mid % 3
        assert sorted(frames) == [f for f in range(n_frames) if f % 2 == 0]
    # per-frame pixels match the generator's closed form
    for r in got:
        blocks = [2 * ((r["media_id"] * 37 + r["frame_no"] * 11
                        + by * 2 + bx) % 128)
                  for by in range(2) for bx in range(2)]
        assert r["sum_gray"] == 64 * sum(blocks)


def test_spark_decode_stage_routes_progressive_to_decode_err(spark):
    """A progressive (SOF2) JPEG in the batch must not kill the stage:
    it lands in decode_err with NULL features while baseline rows
    decode normally."""
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        decode_jpeg_features,
        gen_jpeg_media,
    )

    ids = spark.range(1, 15).select(F.col("id").alias("media_id"))
    got = {r["media_id"]: r for r in
           decode_jpeg_features(
               gen_jpeg_media(ids, progressive_every=7)).collect()}
    assert len(got) == 14  # every input produced a row — stage completed
    for mid in (7, 14):
        assert got[mid]["decode_err"] == "baseline SOF0 only"
        assert got[mid]["width"] is None and got[mid]["sum_gray"] is None
    for mid in (1, 2, 13):
        assert got[mid]["decode_err"] is None
        assert got[mid]["n_pixels"] == 256


def test_all_media_decoders_route_malformed_to_decode_err(spark):
    """Every media decode stage (WAV/PNG/GIF/video, like JPEG) must
    turn an out-of-scope or corrupted input into a decode_err row with
    NULL features — never a task failure."""
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        decode_gif_features,
        decode_png_features,
        decode_video_frames,
        decode_wav_features,
        gen_gif_media,
        gen_mjpeg_media,
        gen_png_media,
        gen_wav_media,
    )

    ids = spark.range(1, 7).select(F.col("id").alias("media_id"))

    wav = {r["media_id"]: r for r in decode_wav_features(
        gen_wav_media(ids, "media_id", malformed_every=3)).collect()}
    assert wav[3]["decode_err"].startswith("only 16-bit PCM")
    assert wav[3]["sum_sq"] is None and wav[4]["decode_err"] is None

    png = {r["media_id"]: r for r in decode_png_features(
        gen_png_media(ids, malformed_every=3)).collect()}
    assert png[3]["decode_err"] == "bad CRC in b'IDAT'"
    assert png[3]["sum_r"] is None and png[5]["decode_err"] is None

    gif = {r["media_id"]: r for r in decode_gif_features(
        gen_gif_media(ids, malformed_every=3)).collect()}
    assert gif[6]["decode_err"] == "not a GIF header"
    assert gif[6]["sum_gray"] is None and gif[1]["decode_err"] is None

    vid = decode_video_frames(
        gen_mjpeg_media(ids, malformed_every=3), every_n=2).collect()
    bad = [r for r in vid if r["media_id"] in (3, 6)]
    good = [r for r in vid if r["media_id"] not in (3, 6)]
    assert {r["decode_err"] for r in bad} == {"not a RIFF/AVI container"}
    assert all(r["frame_no"] is None for r in bad) and len(bad) == 2
    assert good and all(r["decode_err"] is None for r in good)
