"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed:
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic md5-seeded fake decoder produces stable
(width, height, mean_luma) features — the Spark-side plumbing (schema,
batch iteration, partitioning) is real and tested either way.

Design for 100 TB: binary payloads stay in executor memory only for the
duration of one Arrow batch (``maxRecordsPerBatch`` bounds it); metadata
travels in narrow columns so downstream filters/joins never touch bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, payload_sha string"
)


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Real decode is unavailable in this environment (no PIL/opencv).

    reference point: this engine treats decode as a per-batch vectorized
    stage; plug a real decoder in here when codecs exist.
    """
    raise NotImplementedError("image codecs not available in this container")


def fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in: md5-derived (width, height, mean_luma)."""
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas over binary payloads → narrow feature columns."""
    decoder = fake_decode_image if fake else decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                    "payload_sha": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: expands per-video metadata into a
    (media_id, frame_idx) work list WITHOUT touching payloads — the heavy
    decode would be a later mapInPandas keyed by media_id.
    """
    n_frames = F.coalesce(F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        df.where(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = md5 bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, payload, f"application/x-{kind}", {"n_frames": str(90 + i)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, duration_s double, sample_rate int, rms double, payload_sha string"
)

RESIZE_SCHEMA = "media_id long, width int, height int, payload binary, payload_sha string"


def decode_audio(payload: bytes) -> tuple[float, int, float]:
    """Real audio decode is unavailable in this container (no soundfile/
    ffmpeg); plug a real decoder in here when codecs exist."""
    raise NotImplementedError("audio codecs not available in this container")


def fake_decode_audio(payload: bytes) -> tuple[float, int, float]:
    """Deterministic stand-in: md5-derived (duration_s, sample_rate, rms)."""
    h = hashlib.md5(payload or b"").digest()
    duration_s = round(1.0 + h[3] / 16.0, 6)
    sample_rate = (8, 16, 22, 44)[h[4] % 4] * 1000
    rms = round(h[5] / 255.0, 6)
    return duration_s, sample_rate, rms


def extract_audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Audio twin of extract_image_features: mapInPandas over binary
    payloads → narrow (duration, sample_rate, rms) columns. Same Arrow
    batch-residency bound; payloads never leave the stage."""
    decoder = fake_decode_audio if fake else decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms": [f[2] for f in feats],
                    "payload_sha": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        df.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
    )


def fake_resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: output bytes
    are a stable function of (payload, target size), sized ~w*h/64 so
    batch memory scales with the TARGET resolution like a real encoder."""
    seed = hashlib.md5((payload or b"") + f":{width}x{height}".encode()).digest()
    out_len = max(16, (width * height) // 64)
    return (seed * (out_len // len(seed) + 1))[:out_len]


def resize_images(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize plumbing: mapInPandas stage that rewrites the payload column
    at a target resolution. With real codecs, swap fake_resize_image for a
    PIL/opencv decode→resize→encode; the Spark-side contract (schema,
    Arrow batching, per-batch payload residency) is identical."""
    if not fake:
        raise NotImplementedError("image codecs not available in this container")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                fake_resize_image(p if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                    "payload_sha": [hashlib.sha256(b).hexdigest() for b in resized],
                }
            )

    return (
        df.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(batches, RESIZE_SCHEMA)
    )
