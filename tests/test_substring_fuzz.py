"""Property fuzz of the substring window-hash kernel against a per-row
Python reference.

``operators/substring._window_hash_batch`` is the other hand-vectorized
ragged Arrow kernel (the north_star's suffix-array analog: L-token
rolling window hashes + true SIGMOD'03 winnowing).  Like
``compute_signatures_arrow`` (fuzzed in test_sigkernel_fuzz.py) it
flattens token offsets across rows, masks cross-row windows, handles
empty/null rows by surgery on the flattened hash stream, and implements
the per-doc sliding-window minimum selection with stride tricks — all
shapes a fixed-case test can miss.  This checks random unicode texts ×
random (L, winnow) geometry row by row against an implementation with
no vectorization to get wrong.

Reference parity anchor: the window set over tokens mirrors the DCT
hash-over-frame-sequence stage (reference video_hash.rs) re-expressed
for text; winnowing is Schleimer-Wilkerson-Aiken fingerprint selection.

No SparkSession: the kernel is pure Arrow/numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from vid_dup_finder_lib_spark.operators.substring import _window_hash_batch

_WS = re.compile(r"[ \t\n\r\f\v]+")
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xC2B2AE3D27D4EB4F
_M64 = (1 << 64) - 1


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _row_reference(text: str | None, L: int, winnow: int) -> list[int]:
    """One row, computed the slow obvious way: tokenize, hash every
    L-token window with the kernel's rolling combiner, winnow per doc
    (leftmost minimum of every W consecutive window hashes; a doc with
    fewer than W windows keeps its single leftmost minimum), distinct,
    ascending uint64 order."""
    norm = _WS.sub(" ", text or "").strip(" ").lower()
    tokens = [] if norm == "" else norm.split(" ")
    if len(tokens) < L:
        return []
    th = [int(h) for h in pd.util.hash_array(np.asarray(tokens, dtype=object))]
    vals = []
    for i in range(len(th) - L + 1):
        c = 0
        for j in range(L):
            mult = _C1 if j < L - 1 else 1
            c = (c * _C2 + th[i + j] * mult) & _M64
        vals.append(c)
    if winnow > 1:
        sel: set[int] = set()
        if len(vals) < winnow:
            sel.add(min(range(len(vals)), key=lambda i: (vals[i], i)))
        else:
            for s in range(len(vals) - winnow + 1):
                w = vals[s : s + winnow]
                sel.add(s + min(range(winnow), key=lambda j: (w[j], j)))
        vals = [vals[i] for i in sorted(sel)]
    return [_to_i64(v) for v in sorted(set(vals))]


# same alphabet rationale as test_sigkernel_fuzz: 'Z'/'é' exercise
# lowercasing, '漢' non-Latin, NBSP is NOT in the whitespace class (must
# survive inside a token), the rest covers short tokens + every ASCII
# whitespace the class collapses; repeated single-char tokens produce
# DUPLICATE window hashes, exercising winnowing tie-handling.
_ALPHABET = list("abz Z.0é漢\t\n\r\f\v") + [" "]

texts_st = st.lists(
    st.one_of(st.none(), st.text(alphabet=_ALPHABET, max_size=40)),
    min_size=1,
    max_size=12,
)


@settings(deadline=None, max_examples=120)
@given(texts=texts_st, L=st.integers(1, 4), winnow=st.integers(1, 5))
def test_window_kernel_matches_row_reference(texts, L, winnow):
    n = len(texts)
    batch = _window_hash_batch(
        pa.array([f"d{i}" for i in range(n)]),
        pa.array(texts, type=pa.string()),
        L,
        winnow,
    )
    got = batch.to_pylist()
    assert len(got) == n
    for i, (row, text) in enumerate(zip(got, texts)):
        exp = _row_reference(text, L, winnow)
        assert row["id"] == f"d{i}", (i, text)
        assert row["window_hashes"] == exp, (i, text, L, winnow)


@settings(deadline=None, max_examples=80)
@given(
    data=st.data(),
    L=st.integers(1, 5),
    winnow=st.integers(1, 5),
)
def test_winnowing_coverage_guarantee_random_geometry(data, L, winnow):
    """Schleimer-Wilkerson-Aiken contract, fuzzed on the raw kernel: a
    shared verbatim run of >= L + winnow - 1 tokens guarantees at least
    one shared fingerprint — for ANY surrounding text and run position
    (the Spark-side test pins one (L, W); this sweeps the geometry).
    Token vocabularies of the non-shared parts are disjoint by prefix,
    so the shared run is the only source of common windows."""
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    import random

    rng = random.Random(rng_seed)
    run = [f"r{rng.randrange(10**9)}x{i}" for i in range(L + winnow - 1)]
    side = lambda p: [
        f"{p}{rng.randrange(10**9)}x{i}" for i in range(rng.randrange(0, 12))
    ]
    text_a = " ".join(side("a") + run + side("A"))
    text_b = " ".join(side("b") + run + side("B"))
    batch = _window_hash_batch(
        pa.array(["a", "b"]), pa.array([text_a, text_b]), L, winnow
    )
    rows = batch.to_pylist()
    shared = set(rows[0]["window_hashes"]) & set(rows[1]["window_hashes"])
    assert shared, (rng_seed, L, winnow, text_a, text_b)


def test_window_kernel_empty_batch():
    batch = _window_hash_batch(
        pa.array([], type=pa.string()), pa.array([], type=pa.string()), 3, 4
    )
    assert batch.num_rows == 0
