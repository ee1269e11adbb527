"""MinHash calibration fixture generator.

``minhash_estimate_pairs`` reports, per verified near-dup pair, how many of
the 128 MinHash positions agree next to the exact shingle inter/union counts
— the measured per-pair accuracy of the signature family behind the
recall>=0.99 claim (RECALL.md justifies the BANDING; this pins the
ESTIMATOR the banding is built on).  The signature half is engine-internal
(perm family + 32-bit fold — SURVEY.md §1.3), so no ANSI-SQL oracle can
recompute it; like simhash_pairs, the oracle is a parquet fixture from an
**independent, Spark-free** reimplementation.

Frozen contract (typed out here, cross-checked against the engine by probe
in ``_assert_contract_matches_engine`` — a drift FAILS the build, it is
never reproduced):

* shingle hashing: the make_simhash_fixture chain (siphash tokens,
  positional polynomial, distinct) — imported from that tool, same freeze;
* 32-bit fold: ``(u >> 32) ^ (u & 0xFFFFFFFF)`` of the uint64 shingle hash;
* perm family: ``a ~ U[1, 2^31-1), b ~ U[0, 2^31-1)`` drawn from
  ``numpy.random.default_rng(seed)`` in (a-vector, b-vector) order —
  the draw order and generator ARE the contract (SigConfig.fingerprint);
* per-perm value ``(a*x + b) mod (2^31 - 1)``, row signature = min per perm,
  empty rows sentinel ``2^31 - 1``.  The fixture computes it by a
  broadcasting formulation (per-doc matrix min), deliberately different
  from the engine's ``np.minimum.reduceat`` over the flat concatenation.

Pair set: all derived-corpus pairs with exact shingle Jaccard >= 2/5 —
equal to the engine's LSH-verified edge set because LSH recall is 1.0 at
the entry config (the ``minhash_lsh_pairs`` gate proves that equality
against the pure-SQL shingle join every round).

Usage: python tools/make_minhash_fixture.py [sf_dir ...]
Writes fixtures/minhash_estimate_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_simhash_fixture import _shingle_hashes, _tokens  # noqa: E402

NUM_PERMS = 128
SEED = 42
JACCARD_NUM, JACCARD_DEN = 2, 5
_P31 = np.uint64((1 << 31) - 1)


def _perm_family(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P31), size=num_perms, dtype=np.uint64)
    b = rng.integers(0, int(_P31), size=num_perms, dtype=np.uint64)
    return a, b


def _minhash_independent(shingles: np.ndarray) -> np.ndarray:
    """(NUM_PERMS,) int64 signature of one doc's distinct shingle hashes —
    broadcasting formulation (per-doc (perms, n) matrix, min over n)."""
    if len(shingles) == 0:
        return np.full(NUM_PERMS, int(_P31), dtype=np.int64)
    u = shingles.astype(np.uint64)
    x = (u >> np.uint64(32)) ^ (u & np.uint64(0xFFFFFFFF))
    a, b = _perm_family(NUM_PERMS, SEED)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _P31
    return vals.min(axis=1).astype(np.int64)


def _assert_contract_matches_engine() -> None:
    """Probe the engine's perm family + fold + fold order against the frozen
    values above; fail loudly on drift instead of regenerating to match."""
    from vid_dup_finder_lib_spark.functions import hashing as _h

    ea, eb = _h._perm_params(NUM_PERMS, SEED)
    fa, fb = _perm_family(NUM_PERMS, SEED)
    assert np.array_equal(ea, fa) and np.array_equal(eb, fb), (
        "engine perm family drifted from the frozen default_rng contract"
    )
    rng = np.random.default_rng(11)
    for size in (0, 1, 2, 17, 256):
        probe = rng.integers(-(2**62), 2**62, size=size, dtype=np.int64)
        probe = np.unique(probe)
        ours = _minhash_independent(probe)
        flat = probe
        offsets = np.zeros(1, dtype=np.int64)
        lengths = np.array([len(probe)], dtype=np.int64)
        theirs = _h.minhash_signatures(flat, offsets, lengths, NUM_PERMS, SEED)[0]
        assert np.array_equal(ours, theirs), (
            f"minhash fold drifted on probe(size={size})"
        )


def expected_pairs(sf_dir: str) -> pd.DataFrame:
    """All derived-corpus pairs at exact Jaccard >= 2/5 with their exact
    counts and the number of agreeing MinHash positions, without Spark.
    Derived corpus = base docs ∪ mutated copies (+100000, every 10th token
    -> 'zz'), identical to __spark_entry__._derived_neardup."""
    tab = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids: list[int] = []
    shingle_sets: list[np.ndarray] = []
    sigs: list[np.ndarray] = []
    for doc_id, text in zip(
        tab.column("doc_id").to_pylist(), tab.column("text").to_pylist()
    ):
        toks = _tokens(text or "")
        for did, tt in (
            (int(doc_id), toks),
            (
                int(doc_id) + 100000,
                ["zz" if i % 10 == 0 else t for i, t in enumerate(toks)],
            ),
        ):
            sh = _shingle_hashes(tt)
            if len(sh) == 0:
                continue
            ids.append(did)
            shingle_sets.append(np.sort(sh))
            sigs.append(_minhash_independent(sh.view(np.int64)))

    out = {"id1": [], "id2": [], "minhash_matches": [], "inter_count": [], "union_count": []}
    n = len(ids)
    for i in range(n):
        si = shingle_sets[i]
        for j in range(i + 1, n):
            sj = shingle_sets[j]
            inter = len(np.intersect1d(si, sj, assume_unique=True))
            union = len(si) + len(sj) - inter
            if inter * JACCARD_DEN < union * JACCARD_NUM:
                continue
            a, b = ids[i], ids[j]
            lo, hi = (a, b) if a < b else (b, a)
            out["id1"].append(lo)
            out["id2"].append(hi)
            out["minhash_matches"].append(int((sigs[i] == sigs[j]).sum()))
            out["inter_count"].append(inter)
            out["union_count"].append(union)
    return (
        pd.DataFrame(
            {
                "id1": np.asarray(out["id1"], dtype=np.int64),
                "id2": np.asarray(out["id2"], dtype=np.int64),
                "minhash_matches": np.asarray(out["minhash_matches"], dtype=np.int32),
                "inter_count": np.asarray(out["inter_count"], dtype=np.int64),
                "union_count": np.asarray(out["union_count"], dtype=np.int64),
            }
        )
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )


def main() -> None:
    _assert_contract_matches_engine()
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs("/root/repo/fixtures", exist_ok=True)
    for sf_dir in sf_dirs:
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        df = expected_pairs(sf_dir)
        path = f"/root/repo/fixtures/minhash_estimate_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} pairs")


if __name__ == "__main__":
    main()
