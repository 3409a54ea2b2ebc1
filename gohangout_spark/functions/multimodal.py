"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata structs.

The decode/resize/feature steps are the standard mapInPandas shape (Arrow
batches of binary → numpy → binary): the Spark-side plumbing (schemas,
batching, partitioning) is real and tested; the actual codec calls are
STUBBED because image/audio libraries are not available in this container —
``DeterministicFakeCodec`` produces stable pseudo-decodes so the pipeline
shape is verifiable, and ``RealCodec`` raises NotImplementedError at the
exact seam where Pillow/librosa/ffmpeg would plug in.

Scale notes: binary payloads ride in the same parquet row group as their
metadata; mapInPandas keeps the decode on executors with Arrow transfer;
``spark.sql.files.maxPartitionBytes`` should be lowered (e.g. 32 MB) for
tables whose rows are megapixel images so a partition stays in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", IMAGE_META_SCHEMA),
    ]
)


class DeterministicFakeCodec:
    """Stable fake decode: pixels derived from a hash of the payload."""

    def decode(self, payload: bytes) -> np.ndarray:
        h = hashlib.md5(payload or b"").digest()
        w, ht = 4 + h[0] % 4, 4 + h[1] % 4
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return rng.randint(0, 255, size=(ht, w, 3), dtype=np.uint8)

    def encode(self, pixels: np.ndarray) -> bytes:
        return pixels.tobytes()


class RealCodec:  # pragma: no cover - container has no image libs
    def decode(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError("plug Pillow/torchvision here (not in container)")

    def encode(self, pixels: np.ndarray) -> bytes:
        raise NotImplementedError


def make_fake_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic binary media table for pipeline testing."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 8
        rows.append((i, bytearray(payload), (8, 8, 3, "fake")))
    return spark.createDataFrame(rows, IMAGE_TABLE_SCHEMA)


FEATURE_SCHEMA = "media_id long, mean_r double, mean_g double, mean_b double, width int, height int"


def extract_image_features(df: DataFrame, codec=None) -> DataFrame:
    """Decode + per-channel mean features via mapInPandas (Arrow batches)."""
    codec = codec or DeterministicFakeCodec()

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                px = codec.decode(bytes(content))
                means = px.reshape(-1, 3).mean(axis=0)
                out.append(
                    (mid, float(means[0]), float(means[1]), float(means[2]),
                     px.shape[1], px.shape[0])
                )
            yield pd.DataFrame(
                out, columns=["media_id", "mean_r", "mean_g", "mean_b", "width", "height"]
            )

    return df.mapInPandas(feats, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, codec=None) -> DataFrame:
    """Resize via nearest-neighbor on the decoded array (stub-codec friendly);
    returns same schema with new content + updated meta."""
    codec = codec or DeterministicFakeCodec()
    schema = df.schema

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for content in pdf["content"]:
                px = codec.decode(bytes(content))
                ys = (np.linspace(0, px.shape[0] - 1, height)).astype(int)
                xs = (np.linspace(0, px.shape[1] - 1, width)).astype(int)
                resized = px[np.ix_(ys, xs)]
                contents.append(bytearray(codec.encode(resized)))
                metas.append({"width": width, "height": height, "channels": 3, "format": "raw"})
            pdf = pdf.copy()
            pdf["content"] = contents
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(do_resize, schema)


def sample_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stub: the Spark-side contract (explode frames with
    frame_idx) with a deterministic fake frame generator."""
    out_schema = "media_id long, frame_idx int, frame bytes".replace("bytes", "binary")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = 1 + (len(content or b"") % 5)
                for i in range(0, n_frames * every_n, every_n):
                    fake = hashlib.md5(f"{mid}:{i}".encode()).digest()
                    rows.append((mid, i, bytearray(fake)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(frames, out_schema)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, duration_s double, rms double, zero_crossings int"
)


class DeterministicFakeAudioCodec:
    """Stable fake PCM decode: samples derived from a hash of the payload."""

    def decode(self, payload: bytes, sample_rate: int = 16000) -> np.ndarray:
        h = hashlib.md5(payload or b"").digest()
        n = 1000 + h[0] * 16
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        return (rng.randn(n) * 0.1).astype(np.float32)


class RealAudioCodec:  # pragma: no cover - container has no audio libs
    def decode(self, payload: bytes, sample_rate: int = 16000) -> np.ndarray:
        raise NotImplementedError("plug librosa/soundfile here (not in container)")


def extract_audio_features(df: DataFrame, codec=None, sample_rate: int = 16000) -> DataFrame:
    """Decode + basic signal features (duration/RMS/zero crossings) via
    mapInPandas — the audio twin of extract_image_features."""
    codec = codec or DeterministicFakeAudioCodec()

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                pcm = codec.decode(bytes(content), sample_rate)
                rms = float(np.sqrt(np.mean(pcm**2)))
                zc = int(((pcm[:-1] * pcm[1:]) < 0).sum())
                out.append((mid, len(pcm) / sample_rate, rms, zc))
            yield pd.DataFrame(
                out, columns=["media_id", "duration_s", "rms", "zero_crossings"]
            )

    return df.mapInPandas(feats, AUDIO_FEATURE_SCHEMA)
