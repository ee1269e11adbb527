"""Real multimodal decode: PPM (P6) images and RIFF/WAVE audio round-trip
through extract_frame_features(decoder="real") — genuine payloads, checked
feature values, errors as values for unsupported/malformed bytes."""

import io
import math
import wave

import numpy as np

from vid_dup_finder_lib_spark.operators.multimodal import (
    RealDecoder,
    extract_frame_features,
)


def _ppm_bytes(w, h, rgb):
    """P6 payload with a comment in the header (spec-allowed)."""
    header = f"P6\n# test image\n{w} {h}\n255\n".encode()
    return header + bytes(rgb)


def _wav_bytes(freq=440.0, secs=0.25, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        n = int(secs * rate)
        samples = (
            (np.sin(2 * math.pi * freq * np.arange(n) / rate) * 20000)
            .astype("<i2")
            .tobytes()
        )
        wf.writeframes(samples)
    return buf.getvalue()


def test_ppm_decode_values():
    dec = RealDecoder(feature_dim=8)
    # constant mid-gray image: every pooled feature == 120/255
    img = _ppm_bytes(16, 4, [120] * (16 * 4 * 3))
    frames = dec.decode(img)
    assert frames.shape == (1, 8)
    np.testing.assert_allclose(frames[0], 120.0 / 255.0, rtol=1e-6)

    # half black / half white rows: first pooled chunks dark, last bright
    rgb = [0] * (16 * 2 * 3) + [255] * (16 * 2 * 3)
    frames2 = dec.decode(_ppm_bytes(16, 4, rgb))
    assert frames2[0][0] < 0.01 and frames2[0][-1] > 0.99


def test_wav_decode_shape_and_energy():
    dec = RealDecoder(n_frames=4, feature_dim=6)
    frames = dec.decode(_wav_bytes())
    assert frames.shape == (4, 6)
    # a steady sine has roughly equal mean |amplitude| in every window
    energies = frames.mean(axis=1)
    assert energies.min() > 0.3
    assert energies.max() / energies.min() < 1.2

    # silence decodes to ~zero energy
    silent = io.BytesIO()
    with wave.open(silent, "wb") as wf:
        wf.setnchannels(2)  # stereo: exercises channel averaging
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00" * 8000)
    assert RealDecoder(n_frames=4, feature_dim=6).decode(silent.getvalue()).max() == 0.0


def test_real_decoder_through_spark(spark):
    rows = [
        ("img1", "image/x-portable-pixmap", _ppm_bytes(8, 8, [200] * (8 * 8 * 3))),
        ("aud1", "audio/wav", _wav_bytes()),
        ("bad1", "image/gif", b"GIF89a not decodable here"),
        ("empty", None, b""),
    ]
    media = spark.createDataFrame(rows, "media_id string, mime string, payload binary")
    out = extract_frame_features(media, decoder="real", n_frames=4, feature_dim=6)
    got = {r.media_id: r for r in out.collect() if r.frame_idx == 0}
    n_rows = out.count()

    np.testing.assert_allclose(got["img1"].feature, 200.0 / 255.0, rtol=1e-5)
    assert got["aud1"].error is None and len(got["aud1"].feature) == 6
    assert got["bad1"].error.startswith("UnsupportedFormat:")
    assert got["empty"].error == "EmptyPayload"
    # img: 1 frame, audio: 4 frames, two error rows
    assert n_rows == 1 + 4 + 1 + 1


def test_malformed_payloads_are_error_values(spark):
    rows = [
        ("trunc", _ppm_bytes(100, 100, [1] * 30)),        # truncated raster
        ("badwav", b"RIFF" + b"\x00" * 4 + b"WAVEjunk"),  # broken RIFF body
    ]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r.error for r in extract_frame_features(media, decoder="real").collect()}
    assert got["trunc"].startswith("PpmTruncated:")
    assert got["badwav"].startswith("BadWav:")


def test_real_decode_is_deterministic():
    dec = RealDecoder()
    p = _wav_bytes(freq=123.0)
    np.testing.assert_array_equal(dec.decode(p), dec.decode(p))


def test_image_thumbnails_resize_and_errors(spark):
    """Real 2-D resize (the P2 crop+resize analog): a left-dark/right-light
    8x4 image keeps its spatial split in the 4x4 thumbnail; non-PPM and
    truncated payloads become error VALUES."""
    from vid_dup_finder_lib_spark.operators.multimodal import image_thumbnails

    w, h = 8, 4
    rgb = []
    for _y in range(h):
        for x in range(w):
            v = 0 if x < w // 2 else 255
            rgb += [v, v, v]
    rows = [
        ("img-ok", "image/x-portable-pixmap", bytearray(_ppm_bytes(w, h, rgb))),
        ("img-png", "image/png", bytearray(b"\x89PNG\r\n\x1a\n....")),
        ("img-trunc", "image/x-portable-pixmap", bytearray(_ppm_bytes(4, 4, [1] * 5))),
    ]
    media = spark.createDataFrame(rows, "media_id string, mime string, payload binary")
    got = {r.media_id: r for r in image_thumbnails(media, size=4).collect()}

    ok = got["img-ok"]
    assert ok.error is None and (ok.height, ok.width) == (h, w)
    thumb = ok.thumb
    assert len(thumb) == 16
    for r_ in range(4):
        assert thumb[r_ * 4 + 0] == 0.0 and thumb[r_ * 4 + 1] == 0.0
        assert thumb[r_ * 4 + 2] == 1.0 and thumb[r_ * 4 + 3] == 1.0

    assert got["img-png"].error.startswith("UnsupportedFormat:")
    assert got["img-png"].thumb is None
    assert got["img-trunc"].error.startswith("PpmTruncated:")


def test_decode_image_roundtrip_deterministic():
    from vid_dup_finder_lib_spark.operators.multimodal import RealDecoder, _resize_gray

    rgb = [i % 256 for i in range(6 * 5 * 3)]
    img, h, w = RealDecoder().decode_image(_ppm_bytes(6, 5, rgb))
    assert (h, w) == (5, 6) and img.shape == (5, 6)
    a = _resize_gray(img, 3)
    b = _resize_gray(img, 3)
    assert (a == b).all() and a.shape == (3, 3)
