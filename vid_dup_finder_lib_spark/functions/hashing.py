"""Arrow-vectorized signature kernels: MinHash + SimHash.

This is the analog of the reference's hash-compaction stage — the 3D DCT +
sign quantization + bit packing
(``vid_dup_finder_lib/src/video_hashing/raw_dct_ops.rs:107-162``,
``dct_3d.rs:55-66``, ``video_hash.rs:63-72``) — re-targeted to text: the
"frames" are hashed shingles, the "DCT corner" is a 128-permutation MinHash
signature plus a 64-bit SimHash.

Everything is numpy over flattened ragged arrays (`np.minimum.reduceat` /
`np.add.reduceat`), mirroring how the reference hand-vectorized its hot loops
(``frame_change.rs:46-49`` "only way I could get the loop to vectorize").
No per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

# 31-bit Mersenne prime: (a*x + b) stays < 2^63 for 31-bit a and 32-bit x,
# so the whole family evaluates in native uint64 without overflow.
_P31 = np.uint64((1 << 31) - 1)


def _perm_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P31), size=num_perms, dtype=np.uint64)
    b = rng.integers(0, int(_P31), size=num_perms, dtype=np.uint64)
    return a, b


def _fold32(x: np.ndarray) -> np.ndarray:
    """Fold signed-int64 shingle hashes to uint64 values < 2^32."""
    u = x.astype(np.uint64)
    return (u >> np.uint64(32)) ^ (u & np.uint64(0xFFFFFFFF))


def _flatten(series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged list column -> (flat values, segment offsets, lengths)."""
    lengths = np.fromiter(
        (0 if v is None else len(v) for v in series), dtype=np.int64, count=len(series)
    )
    if lengths.sum() == 0:
        return np.empty(0, dtype=np.int64), np.zeros(len(series), dtype=np.int64), lengths
    flat = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in series if v is not None and len(v) > 0]
    )
    offsets = np.zeros(len(series), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return flat, offsets, lengths


def minhash_signatures(
    flat: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, num_perms: int, seed: int
) -> np.ndarray:
    """(n_docs, num_perms) int64 matrix; rows with length 0 are all-sentinel."""
    n = len(lengths)
    out = np.full((n, num_perms), int(_P31), dtype=np.int64)
    if len(flat) == 0:
        return out
    a, b = _perm_params(num_perms, seed)
    x = _fold32(flat)
    nonempty = lengths > 0
    # reduceat needs strictly valid segment starts; compute on the dense
    # concatenation and scatter back to non-empty rows.
    dense_offsets = offsets[nonempty]
    for j in range(num_perms):
        y = (a[j] * x + b[j]) % _P31
        mins = np.minimum.reduceat(y, dense_offsets)
        out[nonempty, j] = mins.astype(np.int64)
    return out


def simhash_values(
    flat: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, bits: int = 64
) -> np.ndarray:
    """(n_docs,) int64 SimHash; empty rows get 0.

    One shift+mask+reduceat pass per bit — no (total, bits) 2D expansion
    (the obvious formulation allocates hundreds of MB per Arrow batch and
    stalls on cold pages).  Majority vote per bit: set iff ones > len/2;
    exact ties -> 0.
    """
    n = len(lengths)
    out = np.zeros(n, dtype=np.int64)
    if len(flat) == 0:
        return out
    u = flat.view(np.uint64) if flat.dtype == np.int64 else flat.astype(np.uint64)
    nonempty = lengths > 0
    dense_offsets = offsets[nonempty]
    dense_lengths = lengths[nonempty].astype(np.uint64)
    packed = np.zeros(len(dense_offsets), dtype=np.uint64)
    one = np.uint64(1)
    for i in range(bits):
        b = (u >> np.uint64(i)) & one
        ones = np.add.reduceat(b, dense_offsets)
        packed |= (ones * np.uint64(2) > dense_lengths).astype(np.uint64) << np.uint64(i)
    out[nonempty] = packed.view(np.int64)
    return out


def minhash_udf_factory(num_perms: int, seed: int):
    """pandas UDF: array<long> shingle hashes -> array<long> MinHash sig
    (null for empty shingle sets — the NotEnoughFrames analog)."""

    @F.pandas_udf("array<long>")
    def minhash_udf(shingle_hashes: pd.Series) -> pd.Series:
        flat, offsets, lengths = _flatten(shingle_hashes)
        sigs = minhash_signatures(flat, offsets, lengths, num_perms, seed)
        return pd.Series(
            [sigs[i].tolist() if lengths[i] > 0 else None for i in range(len(lengths))]
        )

    return minhash_udf


def simhash_udf_factory(bits: int = 64):
    """pandas UDF: array<long> shingle hashes -> long SimHash (null if empty)."""

    @F.pandas_udf("long")
    def simhash_udf(shingle_hashes: pd.Series) -> pd.Series:
        flat, offsets, lengths = _flatten(shingle_hashes)
        vals = simhash_values(flat, offsets, lengths, bits)
        return pd.Series([int(vals[i]) if lengths[i] > 0 else None for i in range(len(lengths))])

    return simhash_udf


# ---------------------------------------------------------------------------
# pure-python reference implementations (test oracles only, never in a plan)
# ---------------------------------------------------------------------------


def minhash_reference(hashes: list[int], num_perms: int, seed: int) -> list[int]:
    a, b = _perm_params(num_perms, seed)
    x = _fold32(np.asarray(hashes, dtype=np.int64))
    return [int(((a[j] * x + b[j]) % _P31).min()) for j in range(num_perms)]


def simhash_reference(hashes: list[int], bits: int = 64) -> int:
    flat = np.asarray(hashes, dtype=np.int64)
    offsets = np.zeros(1, dtype=np.int64)
    lengths = np.array([len(hashes)], dtype=np.int64)
    return int(simhash_values(flat, offsets, lengths, bits)[0])


def hamming64(x: int, y: int) -> int:
    return bin((x ^ y) & ((1 << 64) - 1)).count("1")
