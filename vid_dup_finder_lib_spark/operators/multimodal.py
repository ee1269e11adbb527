"""Multimodal (image/audio/video) column plumbing.

The reference's decode stage (ffmpeg child process -> raw frames,
``ffmpeg_cmdline_utils/src/ffmpeg_ops.rs:21-197``) has no text analog, but a
training-data pipeline at 100 TB carries opaque ``binary`` media columns with
typed metadata, and the *Spark-side shape* of decode / feature-extract /
resize / frame-sample is identical to the reference's: a bounded-memory
per-item transform with errors as values.

Decoders:

* ``decoder="fake"`` — ``DeterministicFakeDecoder``, a seeded,
  content-addressed fake producing stable pseudo-frames from the bytes
  (makes partitioning, UDF signatures, batch shapes and error paths real
  and testable for formats no in-container codec can read);
* ``decoder="real"`` — ``RealDecoder``: genuine decode for the two formats
  readable with what IS in this container (probe: no PIL/cv2/imageio/
  soundfile): **PPM (P6) images**, parsed header + raw RGB with numpy, and
  **RIFF/WAVE audio** via the stdlib ``wave`` module.  Unsupported payloads
  become per-row error VALUES (``UnsupportedFormat:...``) — the cached-
  Result discipline, never a task failure.  Wiring another codec means
  adding one ``_decode_*`` sniffer here.
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


def _mean_pool(vec: np.ndarray, out_dim: int) -> np.ndarray:
    """Deterministic fixed-size pooling: mean over ``out_dim`` equal chunks
    (ragged tail folded into the last chunk)."""
    if len(vec) == 0:
        return np.zeros(out_dim, dtype=np.float32)
    idx = np.linspace(0, len(vec), out_dim + 1).astype(np.int64)
    idx[-1] = len(vec)
    out = np.empty(out_dim, dtype=np.float32)
    for i in range(out_dim):
        lo, hi = idx[i], max(idx[i + 1], idx[i] + 1)
        out[i] = float(vec[lo:hi].mean()) if lo < len(vec) else float(vec[-1])
    return out


class RealDecoder:
    """Actual decode for formats readable without external codec libraries.

    * PPM ``P6`` (binary RGB, the netpbm interchange format): header parsed
      per spec (whitespace-separated tokens, ``#`` comments), pixel data
      grayscaled (mean RGB, normalized by maxval) and mean-pooled to ONE
      frame of ``feature_dim`` floats;
    * ``RIFF....WAVE`` via stdlib ``wave``: 8/16/32-bit PCM, channels
      averaged to mono, the sample stream split into ``n_frames`` equal
      windows (the frame-sampling analog of the reference's 16-frame grab,
      video_hash_builder.rs:56-62), each mean-pooled over absolute
      normalized amplitude to ``feature_dim`` floats.

    Malformed or unsupported payloads raise ValueError with a stable reason
    string; ``extract_frame_features`` converts that to an error VALUE.
    """

    def __init__(self, n_frames: int = 16, feature_dim: int = 32):
        self.n_frames = n_frames
        self.feature_dim = feature_dim

    def decode(self, payload: bytes | None) -> np.ndarray | None:
        if payload is None or len(payload) == 0:
            return None
        if payload[:2] == b"P6":
            return self._decode_ppm(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        raise ValueError(f"UnsupportedFormat:{payload[:4].hex()}")

    def decode_image(self, payload: bytes | None) -> tuple[np.ndarray, int, int]:
        """PPM P6 -> (gray 2-D array in [0,1], height, width) — the raster
        with its spatial structure intact, for resize-class operations.
        Single source of payload sniffing for image consumers: raises
        ValueError("EmptyPayload") / ("UnsupportedFormat:<hex>") with the
        same error vocabulary as decode()."""
        if payload is None or len(payload) == 0:
            raise ValueError("EmptyPayload")
        if payload[:2] != b"P6":
            raise ValueError(f"UnsupportedFormat:{payload[:4].hex()}")
        gray, h, w = self._parse_ppm_gray(payload)
        return gray.reshape(h, w), h, w

    def _decode_ppm(self, payload: bytes) -> np.ndarray:
        gray, _h, _w = self._parse_ppm_gray(payload)
        return _mean_pool(gray, self.feature_dim)[None, :]

    def _parse_ppm_gray(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        pos = 0

        def _token() -> bytes:
            nonlocal pos
            while pos < len(payload):
                c = payload[pos : pos + 1]
                if c == b"#":  # comment runs to end of line
                    while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                        pos += 1
                elif c.isspace():
                    pos += 1
                else:
                    break
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            return payload[start:pos]

        try:
            magic = _token()
            w, h, maxval = int(_token()), int(_token()), int(_token())
            pos += 1  # exactly one whitespace byte separates header and raster
        except (ValueError, IndexError) as exc:
            raise ValueError(f"BadPpmHeader:{exc}") from exc
        if magic != b"P6" or w <= 0 or h <= 0 or not (0 < maxval < 65536):
            raise ValueError("BadPpmHeader:fields")
        bytes_per = 1 if maxval < 256 else 2
        need = w * h * 3 * bytes_per
        raster = payload[pos : pos + need]
        if len(raster) < need:
            raise ValueError(f"PpmTruncated:{len(raster)}/{need}")
        dt = np.uint8 if bytes_per == 1 else np.dtype(">u2")
        px = np.frombuffer(raster, dtype=dt).astype(np.float32).reshape(h * w, 3)
        gray = px.mean(axis=1) / float(maxval)
        return gray, h, w

    def _decode_wav(self, payload: bytes) -> np.ndarray:
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload), "rb") as wf:
                nch = wf.getnchannels()
                sw = wf.getsampwidth()
                raw = wf.readframes(wf.getnframes())
        except (wave.Error, EOFError) as exc:
            raise ValueError(f"BadWav:{exc}") from exc
        if sw == 1:
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif sw == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif sw == 4:
            samples = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"BadWav:sampwidth={sw}")
        if nch > 1:
            samples = samples[: len(samples) - len(samples) % nch]
            samples = samples.reshape(-1, nch).mean(axis=1)
        if len(samples) == 0:
            raise ValueError("BadWav:empty")
        windows = np.array_split(np.abs(samples), self.n_frames)
        return np.stack([_mean_pool(wnd, self.feature_dim) for wnd in windows])


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
        dec = RealDecoder(n_frames, feature_dim)
    else:
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: dict[str, list] = {
                "media_id": [], "frame_idx": [], "feature": [], "error": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = dec.decode(payload)
                    err = None if frames is not None else "EmptyPayload"  # NotVideo analog
                except ValueError as exc:
                    frames, err = None, str(exc)
                if frames is None:
                    out_rows["media_id"].append(mid)
                    out_rows["frame_idx"].append(0)
                    out_rows["feature"].append(None)
                    out_rows["error"].append(err)
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


def _resize_gray(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-index 2D resize to (size, size) — deterministic, pure numpy
    (the reference resizes every frame to a fixed DCT_SIZE edge before
    hashing, video_hash_builder.rs frame prep; no codec/scipy needed)."""
    h, w = img.shape
    ys = (np.arange(size, dtype=np.int64) * h) // size
    xs = (np.arange(size, dtype=np.int64) * w) // size
    return img[ys][:, xs]


THUMBNAIL_SCHEMA = (
    "media_id string, height int, width int, thumb array<float>, error string"
)


def image_thumbnails(media: DataFrame, size: int = 16) -> DataFrame:
    """PPM payloads -> (size x size) grayscale thumbnails (row-major
    flattened), the P2 crop+resize analog on REAL media: decode keeps the
    2-D raster and the resize is a spatial operation, not a mean-pool.
    Non-PPM / malformed payloads become error VALUES (never dropped).

    mapInPandas with bounded Arrow batches, like extract_frame_features.
    """
    dec = RealDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "height": [], "width": [], "thumb": [], "error": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = w = 0
                thumb = None
                err = None
                try:
                    img, h, w = dec.decode_image(
                        None if payload is None else bytes(payload)
                    )
                    thumb = _resize_gray(img, size).reshape(-1).astype(np.float32)
                except ValueError as exc:
                    err = str(exc)
                out["media_id"].append(mid)
                out["height"].append(h)
                out["width"].append(w)
                out["thumb"].append(None if thumb is None else thumb.tolist())
                out["error"].append(err)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=THUMBNAIL_SCHEMA)


def image_ahash(media: DataFrame, size: int = 8) -> DataFrame:
    """Perceptual average-hash over decoded images — the reference's
    CORE operation (a 3D-DCT perceptual hash per video,
    video_hash_builder.rs) re-expressed over the multimodal binary column
    for single images: decode -> ``size``×``size`` gray thumbnail ->
    1 bit per pixel (above the image mean), packed into a 64-bit long.

    Bit packing contract (mirrored by tools/make_ahash_fixture.py): fold
    the thumbnail row-major, ``acc*2 + (pixel > mean)`` — pixel (0,0)
    lands in the most significant of the ``size*size`` used bits; 64-bit
    signed wraparound applies at size 8 (identical in both engines).

    Decode, resize, mean, threshold and packing run FUSED in one
    mapInPandas pass (guide §1.2/§4.2 — the r5 shape shipped the thumb
    arrays back to the JVM only to fold them through two interpreted
    higher-order aggregates per row).  Bit-for-bit identical to the r5
    output, pinned by the committed fixture (tests/test_ahash_oracle.py):
    the thumb value domain is float32 (the former Arrow array<float>),
    the mean is the same LEFT-FOLD double sum the JVM aggregate ran
    (a naive per-element Python loop — numpy's pairwise/unrolled
    summation rounds differently and is deliberately NOT used), the
    comparison promotes float32 -> double exactly like element_at >
    mean, and the pack is the same 64-bit-wrapping MSB-first shift fold.
    Decode failures stay error VALUES (null hash).
    """
    n = size * size
    if n > 64:
        raise ValueError(f"image_ahash: size*size must fit 64 bits, got {n}")
    dec = RealDecoder()
    id_type = media.schema["media_id"].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            hashes: list = []
            errs: list = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    img, _h, _w = dec.decode_image(
                        None if payload is None else bytes(payload)
                    )
                    thumb = (
                        _resize_gray(img, size).reshape(-1).astype(np.float32)
                    )
                except ValueError as exc:
                    hashes.append(None)
                    errs.append(str(exc))
                    continue
                total = 0.0
                for x in thumb:  # sequential left fold == the JVM aggregate
                    total += float(x)
                mean = total / float(n)
                acc = 0
                for x in thumb:
                    acc = ((acc << 1) & 0xFFFFFFFFFFFFFFFF) | (
                        1 if float(x) > mean else 0
                    )
                hashes.append(acc - (1 << 64) if acc >= (1 << 63) else acc)
                errs.append(None)
            # dtype=object: a plain list of ints + None would coerce the
            # column to float64 and silently round hashes beyond 2^53
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "ahash": pd.Series(hashes, dtype="object"),
                    "error": errs,
                }
            )

    return media.mapInPandas(
        run, schema=f"media_id {id_type}, ahash long, error string"
    )


def ahash_hamming_pairs(hashes: DataFrame, radius: int) -> DataFrame:
    """All image pairs with aHash Hamming distance <= radius — the
    reference's tolerance search re-expressed for still images.  Reuses
    the pigeonhole block-key machinery (dedup.simhash_band_keys): split
    64 bits into radius+1 blocks; any pair within radius shares an exact
    block, so candidates come from an equi-join, verified with
    bit_count.  Null hashes (decode errors) never pair."""
    from vid_dup_finder_lib_spark.operators.dedup import simhash_hamming_pairs

    sig = hashes.select(
        F.col("media_id").alias("id"), F.col("ahash").alias("simhash")
    )
    return simhash_hamming_pairs(sig, radius).select(
        F.col("id1").alias("media_id1"),
        F.col("id2").alias("media_id2"),
        F.col("simhash_hamming").alias("hamming"),
    )


def audio_fingerprint(
    media: DataFrame, n_frames: int = 16, feature_dim: int = 32
) -> DataFrame:
    """Delta-sign audio fingerprint — the temporal-modality analog of
    ``image_ahash`` (Chromaprint/landmark-style sign-of-energy-delta
    coding, public knowledge): WAV payloads decode to ``n_frames`` ×
    ``feature_dim`` mean-pooled |amplitude| features (RealDecoder); with
    ``L = n_frames*feature_dim`` and ``stride = L // 64``, bit i compares
    the flattened stream at stride boundaries — ``v[stride*i] >
    v[(stride*i + stride) % L]`` (next block, wrapping) — so all 64 bits
    span the WHOLE clip, not its first frames; packed MSB-first into a
    64-bit long via the same wrapping shiftleft fold as image_ahash
    (mirrored by tools/make_audio_fp_fixture.py — change BOTH together).

    Decode AND packing run fused in one mapInPandas pass (guide §1.2/§4.2):
    the r5 shape emitted 16 per-frame rows per clip through a
    groupBy-collect_list shuffle, an array_sort/flatten, and a 64-step
    interpreted aggregate — all of which only reconstructed the frame
    matrix the decoder already held.  The fused kernel compares/pack in
    numpy on the decoder's own float32 frames; the bit rule, MSB-first
    fold, and the Arrow float32 value domain are bit-identical (the r5
    JVM path compared Arrow float32s; ``np.float32`` performs the same
    IEEE conversion), proven by the committed fixture oracle
    (tests/test_ahash_oracle.py).  Decode failures stay error VALUES
    (null fingerprint)."""
    if n_frames * feature_dim < 65:
        raise ValueError("audio_fingerprint needs at least 65 feature values")
    L = n_frames * feature_dim
    stride = L // 64
    i_idx = np.arange(64, dtype=np.int64) * stride
    j_idx = (i_idx + stride) % L
    dec = RealDecoder(n_frames, feature_dim)
    id_type = media.schema["media_id"].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            fps: list = []
            errs: list = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = dec.decode(payload)
                    err = None if frames is not None else "EmptyPayload"
                except ValueError as exc:
                    frames, err = None, str(exc)
                ids.append(mid)
                if frames is None:
                    fps.append(None)
                    errs.append(err)
                    continue
                # float32 is the value domain the r5 path compared in
                # (Arrow array<float>); same IEEE conversion here
                v = np.asarray(frames, dtype=np.float32).reshape(-1)
                bits = np.zeros(64, dtype=np.uint8)
                if v.size >= L:
                    bits[:] = v[i_idx] > v[j_idx]
                else:
                    # shorter-than-L streams (e.g. a single-frame image
                    # payload routed here): the r5 JVM path's out-of-range
                    # element_at yielded null -> bit 0; emulate per bit
                    ok_ix = (i_idx < v.size) & (j_idx < v.size)
                    bits[ok_ix] = v[i_idx[ok_ix]] > v[j_idx[ok_ix]]
                raw = int.from_bytes(np.packbits(bits).tobytes(), "big")
                fps.append(raw - (1 << 64) if raw >= (1 << 63) else raw)
                errs.append(None)
            # dtype=object: a plain list of ints + None would coerce the
            # column to float64 and silently round hashes beyond 2^53
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "audio_fp": pd.Series(fps, dtype="object"),
                    "error": errs,
                }
            )

    return media.mapInPandas(
        run, schema=f"media_id {id_type}, audio_fp long, error string"
    )


def audio_fp_hamming_pairs(fps: DataFrame, radius: int) -> DataFrame:
    """All audio pairs with fingerprint Hamming distance <= radius — the
    same pigeonhole block-join machinery as ahash_hamming_pairs."""
    from vid_dup_finder_lib_spark.operators.dedup import simhash_hamming_pairs

    sig = fps.select(F.col("media_id").alias("id"), F.col("audio_fp").alias("simhash"))
    return simhash_hamming_pairs(sig, radius).select(
        F.col("id1").alias("media_id1"),
        F.col("id2").alias("media_id2"),
        F.col("simhash_hamming").alias("hamming"),
    )
