"""SimHash oracle fixture generator.

``simhash_pairs`` is the one query whose result is hash-function-dependent
(the 64-bit SimHash is engine-internal by design — SURVEY.md §1.3), so no
ANSI-SQL oracle can recompute it.  Round-1 left it rows-only; this closes it:
an **independent, Spark-free** re-implementation of the whole signature chain
(pure pandas/numpy over parquet read with pyarrow) computes the expected
pairs, which are committed as a parquet fixture the DuckDB oracle reads via
``read_parquet``.  tests/test_simhash_oracle.py regenerates the expectation
and asserts the committed fixture is not stale.

Nothing here executes engine code: the shingle-mix constants are HARD-CODED
(they are part of the frozen signature contract, SigConfig.fingerprint — not
an implementation detail one engine may vary) and the simhash fold is an
independent per-bit majority-vote reimplementation.  The only engine imports
are inside ``_assert_contract_matches_engine``, which cross-checks that the
engine still agrees with the frozen constants/fold on probe values — so a bug
in the engine's shared fold is CAUGHT by the fixture, never reproduced by it.

Usage: python tools/make_simhash_fixture.py [sf_dir ...]
Writes fixtures/simhash_pairs_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RADIUS = 3  # matches __spark_entry__.q_simhash_pairs
SHINGLE_K = 3

# frozen contract constants (splitmix64 / xxhash64 odd multipliers) — typed
# out here by value, deliberately NOT imported from the engine
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)

_WS = re.compile(r"[ \t\n\r\f\x0B]+")


def _simhash_independent(hashes: np.ndarray) -> int:
    """From-scratch 64-bit SimHash: per-bit majority vote over the uint64
    hash values; bit set iff strictly more than half the inputs have it set
    (exact ties -> 0).  Written against the contract prose, not the engine
    code (which uses a shift+reduceat formulation)."""
    u = hashes.view(np.uint64) if hashes.dtype == np.int64 else hashes.astype(np.uint64)
    n = len(u)
    bits = (u[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ones = bits.sum(axis=0)
    packed = 0
    for i in range(64):
        if int(ones[i]) * 2 > n:
            packed |= 1 << i
    return packed if packed < (1 << 63) else packed - (1 << 64)


def _assert_contract_matches_engine() -> None:
    """The one place engine code is touched: probe that the engine's
    constants and simhash fold still equal this tool's independent values.
    A drift here means the frozen signature contract was broken — fail the
    fixture build loudly instead of silently regenerating to match."""
    from vid_dup_finder_lib_spark.functions import sigkernel as _sk
    from vid_dup_finder_lib_spark.functions.hashing import simhash_reference as _engine_fold

    assert _sk._C1 == _C1 and _sk._C2 == _C2, (
        f"engine mix constants drifted: engine ({_sk._C1:#x}, {_sk._C2:#x}) "
        f"vs frozen contract ({int(_C1):#x}, {int(_C2):#x})"
    )
    rng = np.random.default_rng(7)
    for size in (1, 2, 3, 17, 256):
        probe = rng.integers(0, 2**63, size=size, dtype=np.int64)
        ours = _simhash_independent(probe)
        theirs = _engine_fold(probe.tolist())
        assert ours == theirs, (
            f"simhash fold drifted on probe(size={size}): "
            f"independent={ours:#x} engine={theirs:#x}"
        )


def _tokens(text: str) -> list[str]:
    norm = _WS.sub(" ", text).strip().lower()
    return norm.split(" ") if norm else []


def _shingle_hashes(tokens: list[str]) -> np.ndarray:
    """Distinct shingle hash values, mirroring the Arrow kernel: siphash each
    token (pd.util.hash_array, fixed key), positional polynomial combine."""
    th = pd.util.hash_array(np.asarray(tokens, dtype=object))
    total = len(th)
    if total < SHINGLE_K:
        return np.empty(0, dtype=np.uint64)
    comb = np.zeros(total - SHINGLE_K + 1, dtype=np.uint64)
    for j in range(SHINGLE_K):
        mult = _C1 if j < SHINGLE_K - 1 else np.uint64(1)
        comb = comb * _C2 + th[j : total - SHINGLE_K + 1 + j] * mult
    return np.unique(comb)


def _simhash(tokens: list[str]) -> int | None:
    sh = _shingle_hashes(tokens)
    if len(sh) == 0:
        return None
    return _simhash_independent(sh.view(np.int64))


def _popcount64(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def expected_pairs(sf_dir: str, radius: int = RADIUS) -> pd.DataFrame:
    """All derived-corpus pairs with simhash Hamming <= radius, computed
    without Spark.  Derived corpus = base docs ∪ mutated copies (+100000,
    every 10th token -> 'zz'), identical to __spark_entry__._derived_neardup."""
    tab = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids: list[int] = []
    sims: list[int] = []
    for doc_id, text in zip(
        tab.column("doc_id").to_pylist(), tab.column("text").to_pylist()
    ):
        toks = _tokens(text or "")
        for did, tt in (
            (int(doc_id), toks),
            (int(doc_id) + 100000, ["zz" if i % 10 == 0 else t for i, t in enumerate(toks)]),
        ):
            s = _simhash(tt)
            if s is not None:
                ids.append(did)
                sims.append(s)

    id_a = np.asarray(ids, dtype=np.int64)
    sim_a = np.asarray(sims, dtype=np.int64).view(np.uint64)
    out_1, out_2, out_d = [], [], []
    for i in range(len(id_a)):
        d = _popcount64(sim_a[i + 1 :] ^ sim_a[i])
        hit = np.flatnonzero(d <= radius)
        for j in hit:
            a, b = id_a[i], id_a[i + 1 + j]
            lo, hi = (a, b) if a < b else (b, a)
            out_1.append(lo)
            out_2.append(hi)
            out_d.append(int(d[j]))
    return pd.DataFrame(
        {
            "id1": np.asarray(out_1, dtype=np.int64),
            "id2": np.asarray(out_2, dtype=np.int64),
            "simhash_hamming": np.asarray(out_d, dtype=np.int32),
        }
    ).sort_values(["id1", "id2"]).reset_index(drop=True)


def main() -> None:
    _assert_contract_matches_engine()
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs("/root/repo/fixtures", exist_ok=True)
    for sf_dir in sf_dirs:
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        df = expected_pairs(sf_dir)
        path = f"/root/repo/fixtures/simhash_pairs_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} pairs")


if __name__ == "__main__":
    main()
