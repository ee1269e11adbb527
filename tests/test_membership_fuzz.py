"""Differential fuzz of the Bloom membership kernel.

The frozen determinism contract (operators/membership.py module notes):
``pos_i = (sm64(x) + i * (sm64(x ^ GOLDEN) | 1)) mod m_bits`` over the
int64 key, with every intermediate in uint64 (wrapping) arithmetic — so
the bitmap is reimplementable without Spark or numpy.  The existing
tests pin fixed positions (test_membership.test_probe_positions_frozen)
and end-to-end behavior; this file closes the gap in between:

* hypothesis fuzz of the vectorized ``_probe_positions`` kernel against
  a big-int pure-Python implementation with no vectorization to get
  wrong — in particular the reference must wrap ``h1 + i*h2`` mod 2^64
  BEFORE the mod m_bits, exactly the overflow class a naive
  reimplementation would miss (no SparkSession: hundreds of geometries
  per run);
* randomized parity of the Spark build path (``bloom_words``: task-local
  dense fold + distributive bit_or merge, across a multi-partition
  shuffle) against a dense bitmap folded key-by-key from that same
  reference — non-zero word sets must match exactly, zero words must be
  absent;
* EXACT probe parity (not just no-false-negatives): ``bloom_candidates``
  over a mix of members and random non-members must return precisely
  the reference bitmap's answer for every key, false positives
  included.

Reference analog: the blake3 exact-set cache this operator re-expresses
at cluster scale (file_hash_filesystem_cache.rs) never tolerates a false
negative; these properties pin that contract on the distributed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from vid_dup_finder_lib_spark.operators.membership import (
    _probe_positions,
    bloom_build,
    bloom_candidates,
    bloom_words,
)

_M64 = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15


def _sm64_ref(x: int) -> int:
    """SplitMix64 finalizer in plain Python big-int arithmetic."""
    z = (x + _GOLDEN) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _positions_ref(key: int, m_bits: int, k: int) -> list[int]:
    """Per-key probe positions, the slow obvious way.  ``key`` is the
    signed int64; the kernel views it as uint64, so wrap negatives."""
    x = key & _M64
    h1 = _sm64_ref(x)
    h2 = _sm64_ref(x ^ _GOLDEN) | 1
    # the numpy kernel does the add/mul in uint64 -> wraps mod 2^64
    # BEFORE the mod m_bits; the reference must too
    return [((h1 + i * h2) & _M64) % m_bits for i in range(k)]


def _ref_bitmap(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    dense = np.zeros(m_bits // 64, dtype=np.uint64)
    for key in keys:
        for p in _positions_ref(int(key), m_bits, k):
            dense[p // 64] |= np.uint64(1) << np.uint64(p % 64)
    return dense


def _ref_member(dense: np.ndarray, key: int, m_bits: int, k: int) -> bool:
    return all(
        (int(dense[p // 64]) >> (p % 64)) & 1
        for p in _positions_ref(key, m_bits, k)
    )


@given(
    keys=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=1,
        max_size=40,
    ),
    m_words=st.integers(min_value=1, max_value=513),
    k=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=250, deadline=None)
def test_probe_positions_match_bigint_reference(keys, m_words, k):
    m_bits = 64 * m_words
    got = _probe_positions(np.array(keys, dtype=np.int64), m_bits, k)
    assert got.shape == (len(keys), k)
    for row, key in zip(got, keys):
        assert [int(p) for p in row] == _positions_ref(key, m_bits, k)


@given(key=st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
@settings(max_examples=250, deadline=None)
def test_probe_positions_odd_step_and_range(key):
    """h2 | 1 makes the stride odd, so for power-of-two m_bits the k
    probes of one key are pairwise DISTINCT (an even stride could fold
    all probes onto one position and silently halve the filter)."""
    m_bits = 64 * 64  # 4096 = 2^12: stride shares no factor with m
    k = 8
    row = [int(p) for p in _probe_positions(np.array([key], np.int64), m_bits, k)[0]]
    assert all(0 <= p < m_bits for p in row)
    assert len(set(row)) == k


def test_bloom_words_equals_reference_bitmap(spark):
    """The distributed build (multi-partition task-local folds + bit_or
    merge) lands bit-identical to the key-at-a-time reference bitmap:
    same non-zero word set, same word values, no zero-word rows."""
    rng = np.random.default_rng(17)
    for m_bits, k, n in [(64 * 8, 3, 200), (64 * 129, 5, 500), (64 * 1024, 7, 1500)]:
        keys = rng.integers(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
        df = spark.createDataFrame(pd.DataFrame({"key": keys})).repartition(7)
        got = {
            r["word_idx"]: r["word"]
            for r in bloom_words(df, "key", m_bits, k).collect()
        }
        dense = _ref_bitmap(keys, m_bits, k)
        want = {
            int(i): int(dense[i].view(np.int64))
            for i in np.flatnonzero(dense)
        }
        assert got == want, (m_bits, k)


def test_bloom_probe_exact_parity_with_reference(spark):
    """bloom_candidates answers EXACTLY as the reference bitmap for every
    probe key — members all hit (no false negative, the hard contract)
    and each non-member's verdict matches the reference bit-for-bit
    (false positives are deterministic, not noise)."""
    rng = np.random.default_rng(23)
    m_bits, k = 64 * 64, 4
    corpus_keys = rng.integers(-(1 << 62), 1 << 62, size=400, dtype=np.int64)
    corpus = spark.createDataFrame(pd.DataFrame({"key": corpus_keys})).repartition(5)
    words = bloom_build(corpus, "key", m_bits, k)
    dense = _ref_bitmap(corpus_keys, m_bits, k)
    # small m for this n -> real false positives exist among non-members
    probe_keys = np.concatenate(
        [corpus_keys[:100], rng.integers(-(1 << 62), 1 << 62, size=300, dtype=np.int64)]
    )
    out = (
        bloom_candidates(
            spark.createDataFrame(
                pd.DataFrame({"id": np.arange(len(probe_keys)), "key": probe_keys})
            ),
            "key",
            words,
            m_bits,
            k,
        )
        .toPandas()
        .sort_values("id")
    )
    member_set = set(int(x) for x in corpus_keys)
    n_fp = 0
    for _, row in out.iterrows():
        key = int(row["key"])
        want = _ref_member(dense, key, m_bits, k)
        assert bool(row["bloom_hit"]) == want, key
        if key in member_set:
            assert want  # no false negative, ever
        elif want:
            n_fp += 1
    assert n_fp > 0, "geometry should produce some false positives to exercise parity"
