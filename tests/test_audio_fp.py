"""Acoustic fingerprinting over real WAV decode (operators/multimodal)."""

from biothings_crawler_spark.operators.multimodal import (
    audio_dup_groups,
    audio_fingerprint,
    gen_wav_bytes,
    gen_wav_media_seeded,
)


def _media(spark, rows):
    return gen_wav_media_seeded(
        spark.createDataFrame(rows, "media_id long, seed long, amp long"))


def test_gain_invariant_zc_variant_env(spark):
    fps = {r.media_id: r for r in audio_fingerprint(
        _media(spark, [(1, 5, 1), (2, 5, 2), (3, 5, 3)])).collect()}
    assert fps[1].zc_fp == fps[2].zc_fp == fps[3].zc_fp
    assert len({fps[i].env_fp for i in (1, 2, 3)}) == 3
    assert fps[1].n_samples == fps[2].n_samples


def test_different_seeds_differ(spark):
    fps = [r.zc_fp for r in audio_fingerprint(
        _media(spark, [(1, 1, 1), (2, 2, 1), (3, 3, 1)])).collect()]
    assert len(set(fps)) == 3


def test_dup_groups(spark):
    out = {r.media_id: (r.dup_group, r.group_size, r.n_gain_variants)
           for r in audio_dup_groups(audio_fingerprint(_media(spark, [
               (10, 4, 1), (11, 4, 2), (20, 6, 1),
           ]))).collect()}
    assert out[10] == (10, 2, 2) and out[11] == (10, 2, 2)
    assert out[20] == (20, 1, 1)


def test_seeded_generator_matches_legacy_at_unit_gain(spark):
    rows = _media(spark, [(9, 9, 1)]).collect()
    assert bytes(rows[0].content) == gen_wav_bytes(9)
