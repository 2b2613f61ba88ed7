"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

North-star addition (BASELINE.json). The Spark side is REAL — schema, batch
iteration, partition sizing, output contracts are what a production pipeline
uses; only the codec itself is stubbed (image/audio libraries are not in this
container) behind ``DECODERS``: a deterministic fake is registered per
modality so the plumbing is testable end-to-end, and a real decoder (PIL,
torchaudio, pyav...) can be dropped in without touching the Spark code.

Scale notes:
- media blobs dominate row size → ``repartition`` by a size-aware budget
  before CPU-heavy decode so one straggler blob doesn't serialize a task,
- ``mapInPandas`` streams Arrow batches — peak memory is one batch, not one
  partition,
- metadata-only queries never touch the blob column (Catalyst prunes it at
  the parquet scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, digest string, "
    "feature array<float>, decode_ok boolean, decode_err string"
)


def _fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→resize→embed: bytes of the sha256
    digest scaled to [0, 1). Replace with a real codec in production."""
    h = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in h[:dim]]


def _stub_decoder(modality: str) -> Callable[[bytes], list[float]]:
    def _decode(payload: bytes) -> list[float]:
        # REAL DECODE GOES HERE (PIL / torchaudio / pyav). Stubbed:
        # deterministic fake features so plumbing is testable in-container.
        return _fake_image_features(payload)

    return _decode


DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image": _stub_decoder("image"),
    "audio": _stub_decoder("audio"),
    "video": _stub_decoder("video"),
}


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Decode/feature-extract every media row via mapInPandas. Per-row failures
    are captured, not thrown (decode_ok/decode_err) — a 100 TB run must not die
    on one corrupt blob."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    feat = DECODERS[row.modality](bytes(payload))
                    out.append(
                        (
                            row.media_id,
                            row.modality,
                            len(payload),
                            hashlib.sha256(bytes(payload)).hexdigest()[:16],
                            feat,
                            True,
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 — per-row quarantine
                    out.append(
                        (row.media_id, row.modality, 0, None, None, False, str(e))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "modality",
                    "n_bytes",
                    "digest",
                    "feature",
                    "decode_ok",
                    "decode_err",
                ],
            )

    from pgcapture_spark.operators.textstats import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(_proc, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media_id, frame_ts_ms)
    to be decoded — the shuffle-able work list a real frame extractor maps
    over. Pure Catalyst (sequence + explode), no Python."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col("modality") == "video")
        # meta_duration_ms = 0 would make sequence(0, -1, every) raise; a
        # zero-length video degrades to no planned frames (same guard as
        # audio_window_energy)
        .where(F.col("meta_duration_ms").isNotNull() & (F.col("meta_duration_ms") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta_duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-repo media fixture (no external files): payload bytes
    derived from the id."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                bytearray(payload),
                64 if modality == "image" else None,
                64 if modality == "image" else None,
                5000 if modality == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "n_bytes_out long, digest string"
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize of image rows to fit ``max_side``, via
    mapInPandas. The geometry is exact integer math (floor-scaled, never
    upscaled) so the plan is reproducible; the pixel transform is STUBBED —
    the emitted payload digest covers (payload, dst dims), standing in for
    the real resampled bytes. Per the multimodal contract the Spark-side
    plumbing (metadata schema, Arrow batching, partition-parallel map) is the
    real thing; swap the stub for PIL/libvips in production."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                w, h = int(row.src_w), int(row.src_h)
                m = max(w, h)
                if m <= max_side:
                    tw, th = w, h
                else:
                    tw, th = w * max_side // m, h * max_side // m
                payload = bytes(row.payload)
                # REAL RESAMPLE GOES HERE. Stub: digest binds payload+geometry.
                digest = hashlib.sha256(
                    payload + f"|{tw}|{th}".encode()
                ).hexdigest()[:16]
                out.append((row.media_id, w, h, tw, th, tw * th * 3, digest))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "src_w", "src_h", "dst_w", "dst_h",
                    "n_bytes_out", "digest",
                ],
            )

    from pgcapture_spark.operators.textstats import ensure_parallelism

    return ensure_parallelism(media).mapInPandas(_proc, RESIZE_SCHEMA)


def phash_neardup(media: DataFrame, nbits: int = 8) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over decoded media (the image-
    dedup stage of multimodal curation — cf. pHash/aHash dedup in LAION-style
    pipelines): each decoded feature vector thresholds to an ``nbits``-bit
    sign hash; near-duplicates are pairs within Hamming distance 1.

    Candidates come from MULTI-PROBE hashing, not a corpus self-join: every
    row probes its own bucket plus each 1-bit flip (nbits+1 probes), so the
    only corpus-wide operation is an equi hash join on the probe value — at
    100 TB the pair candidates are bounded per bucket, never all-pairs. The
    decode itself is the Arrow-batched mapInPandas stub (swap in a real
    codec: identical plumbing, oracle drops to rows-only).

    Output: (media_id, other_id, hamming, phash, other_hash), media_id <
    other_id, exactly one candidate hit per qualifying pair (own-bucket for
    Hamming 0, the unique flipped probe for Hamming 1 — no dedupe needed).
    """
    nb = int(nbits)
    feats = extract_features(media).where("decode_ok").select("media_id", "feature")
    hashed = feats.select(
        "media_id",
        F.expr(
            f"aggregate(sequence(0, {nb - 1}), 0L, (acc, i) ->"
            " acc + IF(element_at(feature, i + 1) >= 0.5, shiftleft(1L, i), 0L))"
        ).alias("phash"),
    )
    probes = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.expr(
                "concat(array(phash),"
                f" transform(sequence(0, {nb - 1}), i -> phash ^ shiftleft(1L, i)))"
            )
        ).alias("probe"),
    )
    other = hashed.select(
        F.col("media_id").alias("other_id"), F.col("phash").alias("other_hash")
    )
    return (
        probes.join(other, probes.probe == other.other_hash)
        .where(F.col("media_id") < F.col("other_id"))
        .select(
            "media_id",
            "other_id",
            F.expr("CAST(bit_count(phash ^ other_hash) AS BIGINT)").alias("hamming"),
            "phash",
            "other_hash",
        )
    )


AUDIO_WINDOW_SCHEMA = (
    "media_id long, win_idx long, win_start_ms long, n_samples int, "
    "rms string, is_silence boolean"
)


def audio_window_energy(
    media: DataFrame, win_ms: int = 500, n_fake_samples: int = 16
) -> DataFrame:
    """Audio chunking + per-window energy: the audio leg of the multimodal
    contract (reference treats media as opaque bytea the consumer decodes;
    decoders.py handles bytea passthrough — python/pgcapture/decoders.py).

    Two stages, split exactly where a production pipeline splits them:

    1. WINDOW PLAN — pure Catalyst (``sequence`` + ``explode``): one row per
       (media_id, window) from ``meta_duration_ms``. This is the shuffle-able
       work list; at 100 TB it distributes by window, not by blob, so a long
       recording never serializes one task.
    2. WINDOW DECODE — Arrow-batched ``mapInPandas`` over the plan rows. The
       codec is STUBBED deterministically (samples = sha256(media_id:window)
       digest bytes, a fake PCM frame): swap in torchaudio/soundfile reading
       ``payload[offset(window):...]`` without touching the Spark plumbing.
       RMS is emitted as a fixed 6-decimal string (driver canonicalizer
       contract), ``is_silence`` = rms below 40% of max amplitude.
    """
    import math

    plan = (
        media.where(F.col("modality") == "audio")
        # meta_duration_ms = 0 would make sequence(0, -1, win) raise; empty
        # media must degrade to zero windows like the SQL range() oracle
        .where(F.col("meta_duration_ms").isNotNull() & (F.col("meta_duration_ms") > 0))
        .select(
            "media_id",
            F.posexplode(
                F.expr(f"sequence(0L, CAST(meta_duration_ms AS LONG) - 1, {win_ms}L)")
            ).alias("win_idx", "win_start_ms"),
        )
    )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                dig = hashlib.sha256(
                    f"{row.media_id}:{row.win_start_ms}".encode()
                ).digest()[:n_fake_samples]
                mean_sq = sum(b * b for b in dig) / len(dig)
                rms = math.sqrt(mean_sq)
                out.append(
                    (
                        row.media_id,
                        row.win_idx,
                        row.win_start_ms,
                        len(dig),
                        f"{rms:.6f}",
                        rms < 0.4 * 255.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "win_idx",
                    "win_start_ms",
                    "n_samples",
                    "rms",
                    "is_silence",
                ],
            )

    return plan.mapInPandas(_proc, AUDIO_WINDOW_SCHEMA)


# ------------------------------------------------------------ scene cuts

SCENE_FRAME_SCHEMA = "media_id long, frame_ts_ms long, luma int"


def scene_cuts(media: DataFrame, every_ms: int = 1000, threshold: int = 96) -> DataFrame:
    """Video scene-cut detection over the sampled frame plan — the third
    modality leg (image=resize, audio=window energy, video=THIS).

    Same two-stage split as :func:`audio_window_energy`:

    1. FRAME PLAN — :func:`frame_sample_plan` (pure Catalyst sequence +
       explode): one row per (media_id, frame_ts_ms); distributes by frame,
       so a 3-hour recording never serializes one task.
    2. FRAME DECODE — Arrow-batched ``mapInPandas`` emitting one mean-luma
       int per frame. The codec is STUBBED deterministically (luma = first
       sha256(media_id:frame_ts) byte); swap in a real keyframe decoder
       without touching the plan, the window, or the output contract.

    Cuts = frames whose luma jumps >= ``threshold`` against the previous
    sampled frame (lag window over the media key — ONE shuffle, the same
    per-entity partitioning every time-series op here uses)."""
    from pyspark.sql import Window as W

    plan = frame_sample_plan(media, every_ms=every_ms)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lumas = [
                hashlib.sha256(f"{m}:{t}".encode()).digest()[0]
                for m, t in zip(pdf["media_id"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "luma": pd.array(lumas, dtype="int32"),
                }
            )

    frames = plan.mapInPandas(_decode, SCENE_FRAME_SCHEMA)
    w = W.partitionBy("media_id").orderBy("frame_ts_ms")
    d = frames.select(
        "media_id",
        "frame_ts_ms",
        "luma",
        F.lag("luma").over(w).alias("prev_luma"),
    )
    return d.where(
        F.col("prev_luma").isNotNull()
        & (F.abs(F.col("luma") - F.col("prev_luma")) >= threshold)
    ).select(
        "media_id",
        "frame_ts_ms",
        "prev_luma",
        "luma",
        (F.col("luma") - F.col("prev_luma")).cast("int").alias("delta"),
    )
