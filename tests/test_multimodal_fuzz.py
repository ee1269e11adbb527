"""Property fuzz of the multimodal decode path.

operators/multimodal.py hand-writes the only binary parser in the repo —
the netpbm P6 reader (comments, arbitrary whitespace runs, 1- vs 2-byte
samples, the single separator byte before the raster) — plus the
nearest-index resize and the JVM-side aHash bit packing.  The existing
tests (test_multimodal_real.py, test_ahash_oracle.py) pin fixed payloads
and the committed fixture; this file fuzzes the structure space:

* round-trip: random (w, h, maxval) rasters serialized with random
  legal header whitespace/comments decode to exactly the expected
  mean-RGB/maxval gray (same-dtype float32 arithmetic, so equality is
  exact, not approximate) for both 1-byte and big-endian 2-byte
  samples;
* truncation: dropping raster bytes always raises the stable
  ``PpmTruncated`` reason, never returns a short image;
* arbitrary bytes: ``decode_image`` either succeeds or raises
  ``ValueError`` with one of the documented reason prefixes — no other
  exception class ever escapes (the mapInPandas error-value contract
  depends on that);
* ``_resize_gray``: nearest-index semantics checked per output pixel
  against the index formula for random geometries, plus idempotence on
  already-square-size inputs;
* aHash packing: the JVM ``aggregate``/``shiftleft`` fold
  (operators/multimodal.py image_ahash) reproduces a big-int Python
  packer (row-major, MSB-first, 64-bit signed wrap) over random
  thumbnails driven through Spark.

Reference analog: frame decode + fixed-edge resize + bit-packed
perceptual hash is the reference's core build stage
(video_hash_builder.rs frame prep, video_hash.rs packing), re-hosted
here on the PPM modality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from vid_dup_finder_lib_spark.operators.multimodal import (
    RealDecoder,
    _resize_gray,
    image_ahash,
)

_WS = [b" ", b"\t", b"\n", b"\r", b"\x0b", b"\x0c"]


def _sep(rng: np.random.Generator) -> bytes:
    """A legal token separator: 1-3 whitespace bytes, optionally with an
    embedded comment line (which itself must end in newline)."""
    parts = [_WS[int(rng.integers(0, len(_WS)))] for _ in range(int(rng.integers(1, 4)))]
    if rng.random() < 0.4:
        note = bytes(rng.integers(33, 127, size=int(rng.integers(0, 8))).astype(np.uint8))
        # at index >= 1: a '#' butting the previous token's digits would be
        # consumed into that token (comments follow whitespace, per the
        # parser's grammar)
        parts.insert(int(rng.integers(1, len(parts) + 1)), b"#" + note + b"\n")
    return b"".join(parts)


def _make_ppm(rng: np.random.Generator, w: int, h: int, maxval: int) -> tuple[bytes, np.ndarray]:
    """Serialize a random raster; return (payload, expected gray h*w)."""
    wide = maxval >= 256
    px = rng.integers(0, maxval + 1, size=(h * w, 3))
    raster = (
        px.astype(">u2").tobytes() if wide else px.astype(np.uint8).tobytes()
    )
    payload = (
        b"P6" + _sep(rng) + str(w).encode() + _sep(rng) + str(h).encode()
        + _sep(rng) + str(maxval).encode()
        + _WS[int(rng.integers(0, len(_WS)))]  # exactly ONE separator byte
        + raster
    )
    # same-dtype reference: float32 row mean / maxval, as the kernel does
    gray = px.astype(np.float32).mean(axis=1) / float(maxval)
    return payload, gray


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    maxval=st.sampled_from([1, 2, 15, 255, 256, 4095, 65535]),
)
@settings(max_examples=200, deadline=None)
def test_ppm_roundtrip_random_headers(seed, w, h, maxval):
    rng = np.random.default_rng(seed)
    payload, want = _make_ppm(rng, w, h, maxval)
    img, gh, gw = RealDecoder().decode_image(payload)
    assert (gh, gw) == (h, w)
    assert img.shape == (h, w)
    assert np.array_equal(img.reshape(-1), want)


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    drop=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_ppm_truncation_always_detected(seed, drop):
    rng = np.random.default_rng(seed)
    payload, _ = _make_ppm(rng, 4, 3, 255)
    clipped = payload[: len(payload) - min(drop, 4 * 3 * 3)]
    try:
        RealDecoder().decode_image(clipped)
        raise AssertionError("truncated raster decoded")
    except ValueError as exc:
        assert str(exc).startswith("PpmTruncated:")


@given(data=st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_arbitrary_bytes_never_escape_valueerror(data):
    """The mapInPandas error-value contract catches ValueError only; any
    other exception class from hostile bytes would kill the task."""
    try:
        img, h, w = RealDecoder().decode_image(data)
        assert img.shape == (h, w)
    except ValueError as exc:
        reason = str(exc)
        assert reason.split(":")[0] in {
            "EmptyPayload",
            "UnsupportedFormat",
            "BadPpmHeader",
            "PpmTruncated",
        }, reason


@given(
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    h=st.integers(min_value=1, max_value=30),
    w=st.integers(min_value=1, max_value=30),
    size=st.integers(min_value=1, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_resize_gray_nearest_index_semantics(seed, h, w, size):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    out = _resize_gray(img, size)
    assert out.shape == (size, size)
    for y in range(size):
        for x in range(size):
            assert out[y, x] == img[(y * h) // size, (x * w) // size]
    # size==h==w must be the identity
    if h == w == size:
        assert np.array_equal(out, img)


def _ahash_ref(thumb: list[float], n: int) -> int:
    """Row-major MSB-first packing with 64-bit signed wrap, big-int
    Python (the fixture generator's contract restated independently)."""
    mean = sum(float(np.float32(v)) for v in thumb) / n
    acc = 0
    for v in thumb:
        acc = ((acc << 1) | (1 if float(np.float32(v)) > mean else 0)) & ((1 << 64) - 1)
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def test_image_ahash_packing_matches_bigint_reference(spark):
    """Drive random PPMs through the full Spark path (decode ->
    thumbnail -> JVM aggregate packing) and re-derive every hash from
    the payload bytes alone."""
    rng = np.random.default_rng(59)
    rows = []
    for i in range(40):
        w, h = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        maxval = [255, 65535][int(rng.integers(0, 2))]
        payload, _ = _make_ppm(rng, w, h, maxval)
        rows.append((f"m{i:02d}", payload))
    rows.append(("bad", b"\x89PNG\r\n"))
    rows.append(("empty", b""))
    media = spark.createDataFrame(pd.DataFrame(rows, columns=["media_id", "payload"]))
    got = {r["media_id"]: r for r in image_ahash(media, size=8).collect()}
    assert got["bad"]["ahash"] is None and got["bad"]["error"].startswith("UnsupportedFormat")
    assert got["empty"]["ahash"] is None and got["empty"]["error"] == "EmptyPayload"
    dec = RealDecoder()
    for mid, payload in rows[:40]:
        img, _, _ = dec.decode_image(payload)
        thumb = _resize_gray(img, 8).reshape(-1).astype(np.float32).tolist()
        assert got[mid]["error"] is None, (mid, got[mid]["error"])
        assert got[mid]["ahash"] == _ahash_ref(thumb, 64), mid
