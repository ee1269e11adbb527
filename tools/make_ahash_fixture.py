"""Image aHash Hamming-pairs oracle fixture generator.

``q_image_ahash_pairs`` is engine-constant-dependent (PPM decode, nearest-
index resize, float mean threshold, bit packing), so DuckDB cannot
recompute it from the documents table.  Same treatment as simhash /
winnowing / LSH-topk / IVF: an **independent, Spark-free** naive
reimplementation computes the expected (media_id1, media_id2, hamming)
rows from the documented contracts, committed as a parquet fixture the
oracle reads via ``read_parquet``; tests/test_ahash_oracle.py regenerates
and asserts non-staleness and engine agreement.

Contracts reimplemented here FROM THEIR SPECS (not imported from engine
code):

* synthetic 16×16 P6 image per doc + perturbed copy
  (__spark_entry__ contract comment: v(x,y,c) = (base_id*2654435761 +
  x*40503 + y*9719 + c*101 + x*y*(31+base_id%17) +
  (x*x+y*y)*(1+base_id%13)) % 256; copy adds 80 to the 2x2 cells where
  ((x//2)*8 + (y//2) + base_id) % 13 == 0);
* PPM P6 decode: gray = mean(RGB)/maxval in float32 (multimodal.
  RealDecoder spec);
* nearest-index resize to 8×8: row/col indices (arange(8)*16)//8;
* aHash: fold row-major, acc*2 + (pixel > mean), mean = float64
  sequential sum / 64, signed-64 wraparound;
* pairs: naive all-pairs popcount, keep Hamming <= RADIUS, id1 < id2.

Usage: python tools/make_ahash_fixture.py [sf_dir ...]
Writes fixtures/ahash_pairs_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

W = H = 16
SIZE = 8
RADIUS = 6
COPY_OFFSET = 100_000
_MASK = (1 << 64) - 1


def make_image(media_id: int) -> np.ndarray:
    base_id = media_id % COPY_OFFSET
    perturb = media_id >= COPY_OFFSET
    img = np.zeros((H, W, 3), dtype=np.int64)
    for y in range(H):
        for x in range(W):
            for c in range(3):
                v = (
                    base_id * 2654435761
                    + x * 40503
                    + y * 9719
                    + c * 101
                    + x * y * (31 + base_id % 17)
                    + (x * x + y * y) * (1 + base_id % 13)
                ) % 256
                if perturb and ((x // 2) * 8 + (y // 2) + base_id) % 13 == 0:
                    v = (v + 80) % 256
                img[y, x, c] = v
    return img.astype(np.uint8)


def ahash(media_id: int) -> int:
    img = make_image(media_id)
    # decode spec: gray = mean(RGB)/maxval, float32
    gray = img.reshape(H * W, 3).astype(np.float32).mean(axis=1) / 255.0
    gray = gray.reshape(H, W)
    ys = (np.arange(SIZE, dtype=np.int64) * H) // SIZE
    xs = (np.arange(SIZE, dtype=np.int64) * W) // SIZE
    thumb = gray[ys][:, xs].reshape(-1).astype(np.float32)
    mean = sum(float(v) for v in thumb) / float(SIZE * SIZE)  # float64 sequential
    acc = 0
    for v in thumb:  # row-major fold, MSB first
        acc = acc * 2 + (1 if float(v) > mean else 0)
    acc &= _MASK
    return acc - (1 << 64) if acc >= (1 << 63) else acc  # signed-64 like Spark


def expected_pairs(sf_dir: str) -> pd.DataFrame:
    tab = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    base_ids = sorted(int(v) for v in tab.column("doc_id").to_pylist())
    ids = base_ids + [i + COPY_OFFSET for i in base_ids]
    hashes = {mid: ahash(mid) & _MASK for mid in ids}
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
        n_planted = int(
            ((df["media_id2"] - df["media_id1"]) == COPY_OFFSET).sum()
        )
        path = f"/root/repo/fixtures/ahash_pairs_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} rows ({n_planted} planted base/copy pairs)")


if __name__ == "__main__":
    main()
