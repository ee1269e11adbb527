"""Audio delta-sign fingerprint Hamming-pairs oracle fixture generator.

``q_audio_fp_pairs`` is engine-constant-dependent (WAV decode, window
split, mean-pool, float delta thresholds, bit packing) — same fixture
treatment as the image aHash.  Spark-free naive reimplementation FROM THE
SPECS (multimodal.RealDecoder WAV path + _mean_pool docstrings +
audio_fingerprint packing contract; engine code not imported):

* synthetic WAV per doc + perturbed copy (__spark_entry__ contract:
  16-bit PCM mono @8000 Hz, 2048 samples,
  s(t) = (((base_id*131 + t*(7+base_id%11) + (t*t%251)*17) % 4096) - 2048)
         * (1 + (base_id*7 + (t//128)*(3+base_id%5)) % 9)
         + 800*((base_id*13 + t//32) % 5)
  — per-frame gain + per-block DC offset give each id a distinct
  |amplitude| envelope (a flat family collapsed to 83 distinct
  fingerprints in 500; this gives 500/500); the perturbed copy adds 1500
  where (t//32 + base_id*3) % 23 == 0;
* decode: int16 / 32768 in float32, |amplitude|, np.array_split into 16
  windows, linspace mean-pool each to 32 float32 values;
* fingerprint: flatten (frame order); with L = 512 and stride = 8,
  bit i = v[8i] > v[(8i+8) % L] (next block, wrapping — bits span the
  whole clip), MSB-first fold, signed-64 wrap;
* pairs: naive all-pairs popcount <= RADIUS, id1 < id2.

Usage: python tools/make_audio_fp_fixture.py [sf_dir ...]
Writes fixtures/audio_fp_pairs_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

N_SAMPLES = 2048
N_FRAMES = 16
FEATURE_DIM = 32
RADIUS = 3
COPY_OFFSET = 100_000
_MASK = (1 << 64) - 1


def make_samples(media_id: int) -> np.ndarray:
    base_id = media_id % COPY_OFFSET
    perturb = media_id >= COPY_OFFSET
    t = np.arange(N_SAMPLES, dtype=np.int64)
    core = ((base_id * 131 + t * (7 + base_id % 11) + (t * t % 251) * 17) % 4096) - 2048
    gain = 1 + (base_id * 7 + (t // 128) * (3 + base_id % 5)) % 9
    s = core * gain + 800 * ((base_id * 13 + t // 32) % 5)
    if perturb:
        s = s + 1500 * (((t // 32) + base_id * 3) % 23 == 0)
    return s


def mean_pool(vec: np.ndarray, out_dim: int) -> np.ndarray:
    # reimplemented from the documented spec: linspace chunk edges, ragged
    # tail folded into the last chunk
    if len(vec) == 0:
        return np.zeros(out_dim, dtype=np.float32)
    idx = np.linspace(0, len(vec), out_dim + 1).astype(np.int64)
    idx[-1] = len(vec)
    out = np.empty(out_dim, dtype=np.float32)
    for i in range(out_dim):
        lo, hi = idx[i], max(idx[i + 1], idx[i] + 1)
        out[i] = float(vec[lo:hi].mean()) if lo < len(vec) else float(vec[-1])
    return out


def fingerprint(media_id: int) -> int:
    pcm = make_samples(media_id)
    samples = pcm.astype(np.float32) / 32768.0
    windows = np.array_split(np.abs(samples), N_FRAMES)
    flat = np.concatenate([mean_pool(w, FEATURE_DIM) for w in windows])
    L = N_FRAMES * FEATURE_DIM
    stride = L // 64
    acc = 0
    for i in range(64):
        a = float(flat[i * stride])
        b = float(flat[(i * stride + stride) % L])
        acc = (acc * 2 + (1 if a > b else 0)) & _MASK
    return acc


def expected_pairs(sf_dir: str) -> pd.DataFrame:
    tab = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    base_ids = sorted(int(v) for v in tab.column("doc_id").to_pylist())
    ids = base_ids + [i + COPY_OFFSET for i in base_ids]
    hashes = {mid: fingerprint(mid) for mid in ids}
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= RADIUS:
                lo, hi = (a, b) if a < b else (b, a)
                rows.append((lo, hi, d))
    rows.sort()
    return pd.DataFrame(
        rows, columns=["media_id1", "media_id2", "hamming"]
    ).astype("int64")


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs("/root/repo/fixtures", exist_ok=True)
    for sf_dir in sf_dirs:
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        df = expected_pairs(sf_dir)
        n_planted = int(((df["media_id2"] - df["media_id1"]) == COPY_OFFSET).sum())
        path = f"/root/repo/fixtures/audio_fp_pairs_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} rows ({n_planted} planted base/copy pairs)")


if __name__ == "__main__":
    main()
