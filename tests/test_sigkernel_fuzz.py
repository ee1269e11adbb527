"""Property fuzz of the full Arrow signature kernel against a per-row
Python reference.

``compute_signatures_arrow`` is the analog of the reference's whole
hash-build stage (``video_hash_builder.rs:85-157`` sampling policy +
``dct_3d.rs``/``video_hash.rs`` compaction) and is the one place the
library vectorizes ragged text structure by hand: flattened token
offsets, phantom-''-token canonicalization for empty rows, the
skip/max sampling window, cross-row shingle masking, and per-row
distinct-ing via lexsort.  The existing tests pin fixed cases
(test_signatures.py, test_sampling_policy) and the hash kernels
themselves have naive references; this fuzz closes the gap in between —
random unicode texts × random (k, skip, max) geometry, checked row by
row against an implementation with no vectorization to get wrong.

No SparkSession: the kernel is pure Arrow/numpy, so hypothesis can
afford hundreds of geometries per run.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.hashing import (
    minhash_reference,
    simhash_reference,
)
from vid_dup_finder_lib_spark.functions.sigkernel import (
    ERR_NULL_TEXT,
    ERR_TOO_SHORT,
    compute_signatures_arrow,
)

_WS = re.compile(r"[ \t\n\r\f\v]+")
_C1 = 0x9E3779B97F4A7C15
_C2 = 0xC2B2AE3D27D4EB4F
_M64 = (1 << 64) - 1


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _row_reference(text: str | None, cfg: SigConfig) -> dict:
    """One row, computed the slow obvious way."""
    if text is None:
        return {
            "doclen": 0,
            "token_hashes": [],
            "shingle_count": 0,
            "shingle_hashes": [],
            "minhash": None,
            "simhash": None,
            "error": ERR_NULL_TEXT,
        }
    norm = _WS.sub(" ", text).strip(" ").lower()
    tokens = [] if norm == "" else norm.split(" ")
    doclen = len(tokens)
    if cfg.skip_tokens > 0 or cfg.max_tokens is not None:
        start = cfg.skip_tokens if doclen > cfg.skip_tokens else 0
        end = doclen if cfg.max_tokens is None else min(doclen, start + cfg.max_tokens)
        kept = tokens[start:end]
    else:
        kept = tokens
    if kept:
        th = [int(h) for h in pd.util.hash_array(np.asarray(kept, dtype=object))]
    else:
        th = []
    k = cfg.shingle_k
    shingles = set()
    for i in range(len(th) - k + 1):
        c = 0
        for j in range(k):
            mult = _C1 if j < k - 1 else 1
            c = (c * _C2 + th[i + j] * mult) & _M64
        shingles.add(c)
    sh_sorted = sorted(shingles)  # uint64 order, as the kernel's lexsort
    sh_i64 = [_to_i64(v) for v in sh_sorted]
    if not sh_i64:
        return {
            "doclen": doclen,
            "token_hashes": [_to_i64(v) for v in th],
            "shingle_count": 0,
            "shingle_hashes": [],
            "minhash": None,
            "simhash": None,
            "error": ERR_TOO_SHORT,
        }
    return {
        "doclen": doclen,
        "token_hashes": [_to_i64(v) for v in th],
        "shingle_count": len(sh_i64),
        "shingle_hashes": sh_i64,
        "minhash": minhash_reference(sh_i64, cfg.num_perms, cfg.seed),
        "simhash": simhash_reference(sh_i64, cfg.simhash_bits),
        "error": None,
    }


# 'Z'/'É' exercise lowercasing, '漢' non-Latin, ' ' is NOT in the
# kernel's whitespace class (must survive as a token character), the rest
# covers tokens + every ASCII whitespace the class collapses.
_ALPHABET = list("abz Z.0é漢\t\n\r\f\v") + [" "]

texts_st = st.lists(
    st.one_of(st.none(), st.text(alphabet=_ALPHABET, max_size=40)),
    min_size=1,
    max_size=12,
)
cfg_st = st.builds(
    SigConfig,
    shingle_k=st.integers(1, 4),
    skip_tokens=st.integers(0, 3),
    max_tokens=st.one_of(st.none(), st.integers(1, 6)),
    num_perms=st.just(8),
    lsh_bands=st.just(8),
    seed=st.just(7),
)


@settings(deadline=None, max_examples=120)
@given(texts=texts_st, cfg=cfg_st)
def test_kernel_matches_row_reference(texts, cfg):
    n = len(texts)
    batch = compute_signatures_arrow(
        pa.array([f"d{i}" for i in range(n)]),
        pa.array(texts, type=pa.string()),
        cfg,
        include_token_hashes=True,
        content_hash=pa.array([None] * n, pa.string()),
    )
    got = batch.to_pylist()
    assert len(got) == n
    for i, (row, text) in enumerate(zip(got, texts)):
        exp = _row_reference(text, cfg)
        assert row["id"] == f"d{i}"
        for key in ("doclen", "token_hashes", "shingle_count",
                    "shingle_hashes", "minhash", "simhash", "error"):
            assert row[key] == exp[key], (key, i, text, cfg)


def test_kernel_empty_batch():
    cfg = SigConfig(num_perms=8, lsh_bands=8)
    batch = compute_signatures_arrow(
        pa.array([], type=pa.string()),
        pa.array([], type=pa.string()),
        cfg,
        content_hash=pa.array([], pa.string()),
    )
    assert batch.num_rows == 0
