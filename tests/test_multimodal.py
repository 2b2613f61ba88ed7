from __future__ import annotations

from pgcapture_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


def test_feature_extraction_plumbing(spark):
    media = synthetic_media(spark, 48)
    feats = extract_features(media).collect()
    assert len(feats) == 48
    ok = [r for r in feats if r.decode_ok]
    assert len(ok) == 48
    assert all(len(r.feature) == 8 for r in ok)
    # determinism: same payload → same feature
    again = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in ok)


def test_corrupt_blob_is_quarantined_not_fatal(spark):
    media = synthetic_media(spark, 6)
    broken = media.selectExpr(
        "media_id", "modality", "mime",
        "CASE WHEN media_id = 3 THEN CAST(NULL AS BINARY) ELSE payload END AS payload",
        "meta_width", "meta_height", "meta_duration_ms",
    )
    out = {r.media_id: r for r in extract_features(broken).collect()}
    assert not out[3].decode_ok and "NULL payload" in out[3].decode_err
    assert sum(1 for r in out.values() if r.decode_ok) == 5


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, 9)
    plan = frame_sample_plan(media, every_ms=1000).collect()
    videos = [r for r in media.collect() if r.modality == "video"]
    assert len(plan) == len(videos) * 5  # 5000ms / 1000ms
    assert {r.frame_ts_ms for r in plan} == {0, 1000, 2000, 3000, 4000}


def test_audio_window_energy(spark):
    from pgcapture_spark.operators.multimodal import audio_window_energy

    media = synthetic_media(spark, 9).selectExpr(
        "media_id", "modality", "mime", "payload", "meta_width", "meta_height",
        "CASE WHEN modality = 'audio' THEN 1800 ELSE meta_duration_ms END"
        " AS meta_duration_ms",
    )
    out = audio_window_energy(media, win_ms=500).collect()
    audios = [r for r in media.collect() if r.modality == "audio"]
    # 1800 ms at 500 ms hop -> windows at 0/500/1000/1500
    assert len(out) == len(audios) * 4
    assert {r.win_start_ms for r in out} == {0, 500, 1000, 1500}
    assert all(r.win_idx == r.win_start_ms // 500 for r in out)
    assert all(r.n_samples == 16 for r in out)
    # determinism: rerun is identical
    again = sorted(map(tuple, audio_window_energy(media, win_ms=500).collect()))
    assert again == sorted(map(tuple, out))


def test_audio_window_energy_zero_duration_degrades(spark):
    """A zero-duration audio row must produce zero windows (like the SQL
    range(0, 0, hop) oracle), not an 'Illegal sequence boundaries' crash."""
    from pyspark.sql import functions as F

    from pgcapture_spark.operators.multimodal import audio_window_energy

    media = synthetic_media(spark, 9).selectExpr(
        "media_id", "modality", "mime", "payload", "meta_width", "meta_height",
        "CASE WHEN modality = 'audio' THEN 0 ELSE meta_duration_ms END"
        " AS meta_duration_ms",
    )
    assert audio_window_energy(media, win_ms=500).count() == 0
    # mixed: non-empty audio rows keep their windows while empty ones drop
    audio_ids = sorted(r.media_id for r in media.collect() if r.modality == "audio")
    keep = audio_ids[0]
    mixed = media.withColumn(
        "meta_duration_ms",
        F.when(F.col("media_id") == keep, F.lit(1000))
        .otherwise(F.col("meta_duration_ms")),
    )
    out = audio_window_energy(mixed, win_ms=500).collect()
    assert {r.media_id for r in out} == {keep}
    assert sorted(r.win_start_ms for r in out) == [0, 500]


def test_frame_plan_zero_duration_degrades(spark):
    """Same guard for the video frame-sampling plan: a zero-duration video
    yields no planned frames instead of an 'Illegal sequence boundaries'
    crash; positive-duration videos keep their frames."""
    from pyspark.sql import functions as F

    from pgcapture_spark.operators.multimodal import (
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, 9)
    video_ids = sorted(r.media_id for r in media.collect() if r.modality == "video")
    zeroed = media.withColumn(
        "meta_duration_ms",
        F.when(F.col("media_id") == video_ids[0], F.lit(0)).otherwise(
            F.col("meta_duration_ms")
        ),
    )
    out = frame_sample_plan(zeroed, every_ms=1000).collect()
    assert video_ids[0] not in {r.media_id for r in out}
    assert set(video_ids[1:]) <= {r.media_id for r in out}
