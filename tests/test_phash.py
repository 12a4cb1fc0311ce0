"""Perceptual image hash over real decoded PNGs (operators/multimodal)."""

from biothings_crawler_spark.operators.multimodal import (
    decode_png_phash,
    gen_png_media_seeded,
    phash_dup_groups,
)


def _media(spark, rows):
    return gen_png_media_seeded(
        spark.createDataFrame(rows, "media_id long, seed long, bright long"))


def test_same_seed_any_brightness_same_hash(spark):
    out = {r.media_id: (r.phash_hi, r.phash_lo, r.width, r.height)
           for r in decode_png_phash(
               _media(spark, [(1, 9, 0), (2, 9, 25), (3, 9, 75)])).collect()}
    assert out[1] == out[2] == out[3]


def test_different_seeds_differ(spark):
    out = {r.media_id: (r.phash_hi, r.phash_lo)
           for r in decode_png_phash(
               _media(spark, [(1, 3, 0), (2, 4, 0), (3, 5, 0)])).collect()}
    assert len(set(out.values())) == 3


def test_dup_groups(spark):
    hashes = decode_png_phash(_media(spark, [
        (10, 1, 0), (11, 1, 50), (20, 2, 0), (30, 7, 25),
    ]))
    got = {r.media_id: (r.dup_group, r.group_size)
           for r in phash_dup_groups(hashes).collect()}
    assert got[10] == (10, 2) and got[11] == (10, 2)
    assert got[20] == (20, 1) and got[30] == (30, 1)


def test_hash_halves_fit_in_32_bits(spark):
    for r in decode_png_phash(_media(spark, [(1, 6, 0), (2, 13, 25)])).collect():
        assert 0 <= r.phash_hi < 1 << 32 and 0 <= r.phash_lo < 1 << 32


def test_phash_and_audio_fp_route_malformed_to_decode_err(spark):
    """The fingerprint stages share the media-plane policy: corrupt
    bytes become decode_err rows with NULL group fields; valid rows
    still group normally around them."""
    from biothings_crawler_spark.operators.multimodal import (
        audio_dup_groups,
        audio_fingerprint,
        decode_png_phash,
        gen_png_media_seeded,
        gen_wav_media_seeded,
        phash_dup_groups,
    )

    ids = spark.createDataFrame(
        [(1, 5, 0), (2, 5, 25), (3, 6, 0)],
        "media_id long, seed long, amp long",
    ).withColumnRenamed("amp", "bright")
    png = gen_png_media_seeded(ids)
    # corrupt media 3's bytes entirely
    from pyspark.sql import functions as F

    png = png.withColumn(
        "content",
        F.when(F.col("media_id") == 3,
               F.lit(b"not a png at all")).otherwise(F.col("content")),
    )
    out = {r["media_id"]: r for r in
           phash_dup_groups(decode_png_phash(png)).collect()}
    assert len(out) == 3
    assert out[3]["decode_err"] == "not a PNG signature"
    assert out[3]["dup_group"] is None
    assert out[1]["dup_group"] == out[2]["dup_group"] == 1  # same seed
    assert out[1]["group_size"] == 2

    aids = spark.createDataFrame(
        [(1, 5, 1), (2, 5, 3), (3, 6, 1)],
        "media_id long, seed long, amp long",
    )
    wav = gen_wav_media_seeded(aids)
    wav = wav.withColumn(
        "content",
        F.when(F.col("media_id") == 3,
               F.lit(b"RIFFgarbage")).otherwise(F.col("content")),
    )
    fps = {r["media_id"]: r for r in
           audio_dup_groups(audio_fingerprint(wav)).collect()}
    assert len(fps) == 3
    assert fps[3]["decode_err"] is not None and fps[3]["dup_group"] is None
    assert fps[1]["dup_group"] == fps[2]["dup_group"] == 1  # gain-invariant
    assert fps[1]["n_gain_variants"] == 2

def _media_s(spark, rows):
    return gen_png_media_seeded(spark.createDataFrame(
        rows, "media_id long, seed long, bright long, scratch long"))


def test_neardup_exact_and_scratched_pairs(spark):
    """Brightness twins pair at hamming 0; a row-0 scratch stays within
    the 8 bits of dHash cell row 0 (near lane); different seeds don't
    pair at all."""
    from biothings_crawler_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    hashes = decode_png_phash(_media_s(spark, [
        (1, 9, 0, 0), (2, 9, 25, 0),   # exact twins
        (3, 9, 0, 1),                  # scratched sibling of 1/2
        (4, 123, 0, 0),                # unrelated seed
    ]))
    pairs = {(r.media_a, r.media_b): r.hamming
             for r in phash_neardup_pairs(hashes).collect()}
    assert pairs[(1, 2)] == 0
    # the scratch flips only cell-row-0 bits: 0 < hamming <= 8, and the
    # pair survives the <=7 gate for this pinned seed
    assert 0 < pairs[(1, 3)] <= 7 and pairs[(1, 3)] == pairs[(2, 3)]
    assert not any(4 in p for p in pairs)


def test_neardup_scratch_touches_only_low_row_bits(spark):
    """The scratched and unscratched hashes may differ ONLY in dHash
    cell row ci=0 — bits 0..7 of phash_lo."""
    out = {r.media_id: (r.phash_hi, r.phash_lo)
           for r in decode_png_phash(_media_s(spark, [
               (1, 9, 0, 0), (2, 9, 0, 1), (3, 17, 0, 0), (4, 17, 0, 1),
           ])).collect()}
    for a, b in [(1, 2), (3, 4)]:
        assert out[a][0] == out[b][0]                  # hi untouched
        assert (out[a][1] ^ out[b][1]) < 256           # only bits 0..7


def test_neardup_banding_recall_equals_bruteforce(spark):
    """Pigeonhole recall proof on data: the banded join returns exactly
    the brute-force hamming<=7 pair set."""
    from biothings_crawler_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    rows = [(m, 5 + m % 3, (m % 2) * 25, (m % 4) // 2) for m in range(12)]
    hashes = decode_png_phash(_media_s(spark, rows))
    hs = {r.media_id: (r.phash_hi, r.phash_lo) for r in hashes.collect()}
    brute = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = (bin(hs[a][0] ^ hs[b][0]).count("1")
                 + bin(hs[a][1] ^ hs[b][1]).count("1"))
            if d <= 7:
                brute[(a, b)] = d
    got = {(r.media_a, r.media_b): r.hamming
           for r in phash_neardup_pairs(hashes).collect()}
    assert got == brute and brute  # non-vacuous


def test_neardup_decode_err_rows_never_pair(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        phash_neardup_pairs,
    )

    png = _media_s(spark, [(1, 9, 0, 0), (2, 9, 25, 0), (3, 9, 0, 0)])
    png = png.withColumn(
        "content",
        F.when(F.col("media_id") == 3,
               F.lit(b"junk")).otherwise(F.col("content")))
    pairs = {(r.media_a, r.media_b) for r in
             phash_neardup_pairs(decode_png_phash(png)).collect()}
    assert pairs == {(1, 2)}


def test_audio_match_gain_invariant_and_glitch_local(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        audio_block_fps,
        audio_match_pairs,
        gen_wav_media_seeded,
    )

    # seed 9: n = 800 + 4*160 = 1440, c = 2 -> 2880 samples -> 12
    # blocks -> 9 windows; glitch kills <= 3 of them
    ids = spark.createDataFrame(
        [(1, 9, 1, 0), (2, 9, 3, 0), (3, 9, 1, 1), (4, 123, 1, 0)],
        "media_id long, seed long, amp long, glitch long")
    fps = audio_block_fps(gen_wav_media_seeded(ids))
    pairs = {(r.media_a, r.media_b): (r.n_match, r.match_ppm)
             for r in audio_match_pairs(fps).collect()}
    assert pairs[(1, 2)] == (9, 10**6)          # pure gain: full match
    n3, ppm3 = pairs[(1, 3)]
    assert 6 <= n3 < 9 and 500_000 <= ppm3 < 10**6
    assert pairs[(1, 3)] == pairs[(2, 3)]       # gain doesn't interact
    assert not any(4 in p for p in pairs)       # unrelated seed

    # corrupt clip: one decode_err row, never pairs
    wav = gen_wav_media_seeded(ids).withColumn(
        "content",
        F.when(F.col("media_id") == 4,
               F.lit(b"RIFFjunk")).otherwise(F.col("content")))
    out = audio_block_fps(wav)
    errs = out.filter(F.col("decode_err").isNotNull()).collect()
    assert len(errs) == 1 and errs[0].media_id == 4
    pairs2 = {(r.media_a, r.media_b)
              for r in audio_match_pairs(out).collect()}
    assert pairs2 == {(1, 2), (1, 3), (2, 3)}


def test_audio_match_short_clip_raises_into_err_lane(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.operators.multimodal import (
        audio_block_fps,
        gen_wav_media_seeded,
    )

    # seed 0, c=1, n=800 -> 4 blocks = exactly W: 1 window, fine;
    # truncate the payload to < 4 blocks to hit the short-clip error
    ids = spark.createDataFrame([(1, 0, 1, 0)],
                                "media_id long, seed long, amp long, "
                                "glitch long")
    wav = gen_wav_media_seeded(ids)
    ok = audio_block_fps(wav).collect()
    assert all(r.decode_err is None for r in ok) and len(ok) == 1
    import io
    import wave as _wave

    buf = io.BytesIO()
    w = _wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(b"\x00\x01" * 100)   # 100 samples < 4 blocks
    w.close()
    short = spark.createDataFrame([(9, bytearray(buf.getvalue()))],
                                  "media_id long, content binary")
    rows = audio_block_fps(short).collect()
    assert len(rows) == 1 and "shorter than" in rows[0].decode_err
