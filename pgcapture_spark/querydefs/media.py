"""Multimodal queries (north-star additions): opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The media view is derived deterministically from ``documents`` (payload =
utf-8 bytes of the text, modality by doc_id % 3), so the whole pipeline —
including the Python mapInPandas decode path — is ORACLE-CHECKABLE: the
stubbed feature extractor (sha256-digest bytes scaled to [0,1), see
operators/multimodal.py) is re-expressed in DuckDB SQL. Swapping the stub for
a real codec keeps the Spark plumbing identical and drops this oracle to a
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgcapture_spark.catalog import register_views
from pgcapture_spark.operators.multimodal import extract_features, frame_sample_plan
from pgcapture_spark.queries import q

_MODALITY = (
    "CASE WHEN media_id % 3 = 0 THEN 'image' "
    "WHEN media_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)


def media_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media: payload is the utf-8 text bytes; videos get a
    duration derived from the char count (10 ms per char)."""
    register_views(spark, sf_dir, ("documents",))
    m = spark.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("n_chars"),
    )
    return m.select(
        "media_id",
        F.expr(_MODALITY).alias("modality"),
        F.lit(None).cast("string").alias("mime"),
        "payload",
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.when(F.expr(_MODALITY) == "video", (F.col("n_chars") * 10).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("meta_duration_ms"),
    )


_DUCK_MEDIA = f"""
SELECT doc_id AS media_id,
       {_MODALITY.replace("media_id", "doc_id")} AS modality,
       text,
       n_chars
FROM documents
"""

# DuckDB's sha256 takes VARCHAR (hashes its utf-8 bytes) — identical input to
# the Python stub's sha256 over the utf-8 payload.
# the feature vector is serialized to a canonical string (8-decimal fixed
# format — i/256 is exactly representable, so no cross-engine rounding): the
# driver's row canonicalizer cannot hash top-level arrays.
_DUCK_FEATURES = f"""
WITH m AS ({_DUCK_MEDIA})
SELECT media_id, modality,
       octet_length(encode(text)) AS n_bytes,
       substr(sha256(text), 1, 16) AS digest,
       array_to_string(list_transform(range(0, 8),
         i -> printf('%.8f', ('0x' || substr(sha256(text), 2 * i + 1, 2))::INT / 256.0)),
         ',') AS feature,
       true AS decode_ok
FROM m
"""


@q(
    "media_features_pandas",
    _DUCK_FEATURES,
    "North-star: multimodal feature extraction — binary payloads through an"
    " Arrow-batched mapInPandas decode (stub codec = sha256-digest features;"
    " per-row failure quarantine).",
)
def media_features_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(media_view(spark, sf_dir))
    return feats.select(
        "media_id",
        "modality",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "digest",
        F.expr(
            "concat_ws(',', transform(feature, x -> format_string('%.8f', CAST(x AS DOUBLE))))"
        ).alias("feature"),
        "decode_ok",
    )


_DUCK_FRAME_PLAN = f"""
WITH m AS ({_DUCK_MEDIA})
SELECT media_id, unnest(range(0, n_chars * 10, 1000)) AS frame_ts_ms
FROM m WHERE modality = 'video'
"""


@q(
    "media_frame_plan",
    _DUCK_FRAME_PLAN,
    "North-star: video frame-sampling plan — one row per (media_id, frame_ts)"
    " to decode; pure Catalyst sequence+explode, the shuffle-able work list a"
    " real frame extractor maps over.",
)
def media_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = frame_sample_plan(media_view(spark, sf_dir), every_ms=1000)
    return plan.select("media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"))


# deterministic synthetic source dims for image rows (no real headers in the
# fixture payloads): w/h are pure functions of media_id, so the oracle can
# re-derive them.
_DIMS = "32 + (media_id * 7) % 480 AS src_w, 32 + (media_id * 13) % 480 AS src_h"

_DUCK_RESIZE = f"""
WITH m AS ({_DUCK_MEDIA}),
img AS (
  SELECT media_id, text, {_DIMS.replace("media_id", "media_id")}
  FROM m WHERE modality = 'image'
),
geo AS (
  SELECT media_id, text, src_w, src_h,
         CASE WHEN greatest(src_w, src_h) <= 256 THEN src_w
              ELSE src_w * 256 // greatest(src_w, src_h) END AS dst_w,
         CASE WHEN greatest(src_w, src_h) <= 256 THEN src_h
              ELSE src_h * 256 // greatest(src_w, src_h) END AS dst_h
  FROM img
)
SELECT media_id, src_w, src_h, dst_w, dst_h,
       CAST(dst_w AS BIGINT) * dst_h * 3 AS n_bytes_out,
       substr(sha256(text || '|' || dst_w || '|' || dst_h), 1, 16) AS digest
FROM geo
"""


@q(
    "media_resize_pandas",
    _DUCK_RESIZE,
    "North-star: multimodal resize — aspect-preserving integer fit to 256px"
    " planned from typed metadata, pixel transform stubbed behind an Arrow-"
    "batched mapInPandas whose digest binds payload+geometry.",
)
def media_resize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.multimodal import resize_images

    media = media_view(spark, sf_dir).where(F.col("modality") == "image")
    media = media.select(
        "media_id",
        "payload",
        F.expr("CAST(32 + (media_id * 7) % 480 AS INT)").alias("src_w"),
        F.expr("CAST(32 + (media_id * 13) % 480 AS INT)").alias("src_h"),
    )
    return resize_images(media)


# ------------------------------------------------------- pHash near-dup

# brute-force oracle: at correctness scale a full self-join is fine; the
# Spark side must produce the SAME pairs via multi-probe candidate
# generation (the scale path).
_DUCK_PHASH = f"""
WITH m AS (SELECT doc_id AS media_id, text FROM documents),
h AS (SELECT media_id,
             CAST(list_sum(list_transform(range(0, 8),
               i -> CASE WHEN ('0x' || substr(sha256(text), 2 * i + 1, 2))::INT
                              / 256.0 >= 0.5
                    THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS phash
      FROM m)
SELECT a.media_id AS media_id, b.media_id AS other_id,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming,
       a.phash AS phash, b.phash AS other_hash
FROM h a JOIN h b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 1
"""


@q(
    "media_neardup_phash",
    _DUCK_PHASH,
    "North-star multimodal: perceptual-hash near-duplicate pairs — decoded"
    " features (Arrow-batched mapInPandas stub codec) threshold to an 8-bit"
    " sign hash; Hamming<=1 pairs found by MULTI-PROBE bucket equi-join"
    " (own bucket + each 1-bit flip), never an all-pairs self-join; the"
    " oracle brute-forces the same pairs at correctness scale.",
)
def media_neardup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.multimodal import phash_neardup

    return phash_neardup(media_view(spark, sf_dir))


_DUCK_AUDIO_WINDOWS = f"""
WITH m AS (
  SELECT doc_id AS media_id, n_chars * 8 AS dur
  FROM documents
  WHERE doc_id % 3 = 1
),
w AS (
  SELECT media_id, unnest(range(0, CAST(dur AS BIGINT), 500)) AS win_start_ms
  FROM m
),
s AS (
  SELECT media_id, win_start_ms,
         list_transform(range(16),
           i -> ('0x' || substr(sha256(CAST(media_id AS VARCHAR) || ':' ||
                 CAST(win_start_ms AS VARCHAR)), 2 * i + 1, 2))::INT) AS smp
  FROM w
)
SELECT media_id,
       CAST(win_start_ms // 500 AS BIGINT) AS win_idx,
       CAST(win_start_ms AS BIGINT) AS win_start_ms,
       CAST(16 AS INT) AS n_samples,
       printf('%.6f', sqrt(list_sum(list_transform(smp, b -> b * b)) / 16.0)) AS rms,
       sqrt(list_sum(list_transform(smp, b -> b * b)) / 16.0) < 102.0 AS is_silence
FROM s
"""


@q(
    "media_audio_windows",
    _DUCK_AUDIO_WINDOWS,
    "North-star: the audio leg of the multimodal contract — Catalyst window"
    " plan (sequence+explode over meta_duration_ms, the shuffle-able work"
    " list) + Arrow-batched mapInPandas per-window energy with a stubbed"
    " deterministic codec (sha256 fake PCM frame; swap in torchaudio without"
    " touching the Spark plumbing). RMS fixed 6-decimal string, silence flag"
    " at 40% max amplitude.",
)
def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.multimodal import audio_window_energy

    register_views(spark, sf_dir, ("documents",))
    m = spark.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.expr(_MODALITY.replace("media_id", "doc_id")).alias("modality"),
        F.lit(None).cast("string").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        (F.col("n_chars") * 8).cast("int").alias("meta_duration_ms"),
    )
    return audio_window_energy(m, win_ms=500, n_fake_samples=16)


# ------------------------------------------------------------ scene cuts

_DUCK_SCENE_CUTS = """
WITH v AS (SELECT doc_id AS media_id, n_chars * 10 AS dur
           FROM documents WHERE doc_id % 3 = 2),
f AS (SELECT media_id, unnest(range(0, CAST(dur AS BIGINT), 1000)) AS frame_ts_ms
      FROM v),
l AS (SELECT media_id, frame_ts_ms,
             ('0x' || substr(sha256(CAST(media_id AS VARCHAR) || ':' ||
                             CAST(frame_ts_ms AS VARCHAR)), 1, 2))::INT AS luma
      FROM f),
d AS (SELECT media_id, frame_ts_ms, luma,
             lag(luma) OVER (PARTITION BY media_id ORDER BY frame_ts_ms) AS prev_luma
      FROM l)
SELECT media_id, CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
       CAST(prev_luma AS INT) AS prev_luma, CAST(luma AS INT) AS luma,
       CAST(luma - prev_luma AS INT) AS delta
FROM d WHERE prev_luma IS NOT NULL AND abs(luma - prev_luma) >= 96
"""


@q(
    "media_scene_cuts",
    _DUCK_SCENE_CUTS,
    "North-star: the video leg of the multimodal contract — scene-cut"
    " detection over the sampled frame plan (Catalyst sequence+explode work"
    " list, Arrow-batched mapInPandas stub keyframe decode, lag window on"
    " the media key); cut = luma jump >= 96 between adjacent sampled frames.",
)
def media_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgcapture_spark.operators.multimodal import scene_cuts

    return scene_cuts(media_view(spark, sf_dir), every_ms=1000, threshold=96)


_DUCK_MEDIA_DEDUP = f"""
WITH m AS (SELECT doc_id AS media_id,
                  {_MODALITY.replace("media_id", "doc_id")} AS modality,
                  sha256(text) AS content_sha256
           FROM documents)
SELECT content_sha256, modality,
       CAST(count(*) AS BIGINT) AS n_copies,
       min(media_id) AS keeper_id
FROM m GROUP BY content_sha256, modality
HAVING count(*) >= 2
"""


@q(
    "media_dedup_exact",
    _DUCK_MEDIA_DEDUP,
    "North-star: exact media dedup by CONTENT hash — sha256 over the opaque"
    " binary payload (the blob-store dedup key), grouped per modality;"
    " keep-lowest-id survivor policy, duplicate groups reported with copy"
    " counts. One hash projection fused into the scan + one hash-agg"
    " shuffle; payload bytes never shuffle (only the 32-byte digest does) —"
    " the property that makes this viable on petabyte media columns.",
)
def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_view(spark, sf_dir)
    return (
        media.select(
            "media_id", "modality", F.sha2("payload", 256).alias("content_sha256")
        )
        .groupBy("content_sha256", "modality")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("media_id").alias("keeper_id"),
        )
        .where(F.col("n_copies") >= 2)
    )
