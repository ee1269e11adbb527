"""Multimodal (image/audio/video) column plumbing.

The reference's decode stage (ffmpeg child process -> raw frames,
``ffmpeg_cmdline_utils/src/ffmpeg_ops.rs:21-197``) has no text analog, but a
training-data pipeline at 100 TB carries opaque ``binary`` media columns with
typed metadata, and the *Spark-side shape* of decode / feature-extract /
resize / frame-sample is identical to the reference's: a bounded-memory
per-item transform with errors as values.

The codec libraries are not in this container, so the decode kernels are
STUBBED behind ``DeterministicFakeDecoder`` (a seeded, content-addressed fake
that produces stable pseudo-frames from the bytes — making the partitioning,
UDF signatures, batch shapes and error paths real and testable) or raise
``NotImplementedError`` when ``decoder="real"`` is requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)


class DeterministicFakeDecoder:
    """Content-addressed fake decode: frames are derived from a seeded PRNG
    keyed by the payload bytes, so re-runs (and the incremental cache) see
    identical 'decoded' output — the property the real decoder must have."""

    def __init__(self, n_frames: int = 16, feature_dim: int = 32):
        self.n_frames = n_frames
        self.feature_dim = feature_dim

    def decode(self, payload: bytes | None) -> np.ndarray | None:
        if payload is None or len(payload) == 0:
            return None
        key = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        rng = np.random.default_rng(int(key) ^ len(payload))
        return rng.standard_normal((self.n_frames, self.feature_dim)).astype(np.float32)


def _real_decoder(*_a, **_k):
    raise NotImplementedError(
        "real media decode requires codec libraries not present in this "
        "environment; wire an image/audio/video decoder here"
    )


def extract_frame_features(
    media: DataFrame,
    decoder: str = "fake",
    n_frames: int = 16,
    feature_dim: int = 32,
) -> DataFrame:
    """media (media_id, payload, ...) -> one row per sampled frame with a
    feature vector; errors as values (the cached-Result analog).

    mapInPandas so each Arrow batch is decoded with bounded memory — the
    5 GB frame-buffer-cap discipline of the reference (ffmpeg_ops.rs:40-62)
    maps to Arrow batch sizing (spark.sql.execution.arrow.maxRecordsPerBatch).
    """
    if decoder == "fake":
        dec = DeterministicFakeDecoder(n_frames, feature_dim)
    elif decoder == "real":
        dec = None
        _real_decoder()
    else:
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: dict[str, list] = {
                "media_id": [], "frame_idx": [], "feature": [], "error": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = dec.decode(payload)
                if frames is None:
                    out_rows["media_id"].append(mid)
                    out_rows["frame_idx"].append(0)
                    out_rows["feature"].append(None)
                    out_rows["error"].append("EmptyPayload")  # NotVideo analog
                    continue
                for i, f in enumerate(frames):
                    out_rows["media_id"].append(mid)
                    out_rows["frame_idx"].append(i)
                    out_rows["feature"].append(f.tolist())
                    out_rows["error"].append(None)
            yield pd.DataFrame(out_rows)

    return media.mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection over the opaque binary column (pure JVM)."""
    return media.select(
        "media_id",
        "mime",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5(F.col("payload").cast("string")).alias("payload_md5"),
    )


def frame_sample(features: DataFrame, every: int = 8) -> DataFrame:
    """Every-Nth frame sampling (the reference's sample-every-8th crop pass,
    video_frames_gray.rs:201-210)."""
    return features.where(F.col("frame_idx") % every == 0)
