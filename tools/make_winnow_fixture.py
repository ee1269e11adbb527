"""Winnowed-substring oracle fixture generator.

``substring_winnowed_pairs`` (L=8, winnow=4) is hash-ORDER-dependent: the
winnow keeps the minimum 64-bit window hash of every W-window, so unlike the
winnow=1 pair set (token-text-expressible, the existing ANSI-SQL oracle) the
kept subset cannot be recomputed by DuckDB.  Same treatment as simhash
(tools/make_simhash_fixture.py): an **independent, Spark-free**
reimplementation computes the expected pairs, committed as a parquet fixture
the oracle reads via ``read_parquet``; tests/test_winnow_oracle.py
regenerates and asserts both non-staleness and engine agreement.

Independence: the window-hash mixing constants are HARD-CODED (frozen
contract values) and the winnow selection is a naive per-window argmin loop
written against the Schleimer et al. spec — not the engine's vectorized
sliding_window_view formulation.

Usage: python tools/make_winnow_fixture.py [sf_dir ...]
Writes fixtures/substring_winnow_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 8        # matches __spark_entry__.q_substring_winnowed_pairs
WINNOW = 4

# frozen contract constants — typed by value, NOT imported from the engine
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)

_WS = re.compile(r"[ \t\n\r\f\x0B]+")


def _tokens(text: str) -> list[str]:
    norm = _WS.sub(" ", text).strip().lower()
    return norm.split(" ") if norm else []


def _window_hashes_positional(tokens: list[str]) -> np.ndarray:
    """L-token rolling window hashes in positional order (the shingle-fold
    formula at k=L; positional because winnowing is order-sensitive)."""
    if len(tokens) < L:
        return np.empty(0, dtype=np.uint64)
    th = pd.util.hash_array(np.asarray(tokens, dtype=object))
    n = len(th) - L + 1
    comb = np.zeros(n, dtype=np.uint64)
    for j in range(L):
        mult = _C1 if j < L - 1 else np.uint64(1)
        comb = comb * _C2 + th[j : n + j] * mult
    return comb


def _winnow_kept(vals: np.ndarray, w: int) -> set[int]:
    """Naive spec implementation: for every window of w consecutive hashes
    keep the (leftmost-) minimum value; a doc with fewer than w windows
    keeps its single minimum."""
    n = len(vals)
    if n == 0:
        return set()
    if w <= 1 or n < w:
        if w <= 1:
            return {int(v) for v in vals}
        return {int(vals[int(np.argmin(vals))])}
    kept: set[int] = set()
    for i in range(n - w + 1):
        kept.add(int(vals[i + int(np.argmin(vals[i : i + w]))]))
    return kept


def expected_pairs(sf_dir: str) -> pd.DataFrame:
    """(id1, id2, shared_windows) over the derived corpus (base docs ∪
    mutated +100000 copies, identical to __spark_entry__._derived_neardup),
    where shared_windows counts DISTINCT kept window values both sides
    retained after winnowing."""
    tab = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    index: dict[int, list[int]] = defaultdict(list)
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
            for v in _winnow_kept(_window_hashes_positional(tt), WINNOW):
                index[v].append(did)

    counts: dict[tuple[int, int], int] = defaultdict(int)
    for docs in index.values():
        if len(docs) < 2:
            continue
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                counts[(docs[i], docs[j])] += 1
    rows = sorted((a, b, c) for (a, b), c in counts.items())
    return pd.DataFrame(rows, columns=["id1", "id2", "shared_windows"]).astype(
        {"id1": "int64", "id2": "int64", "shared_windows": "int64"}
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs("/root/repo/fixtures", exist_ok=True)
    for sf_dir in sf_dirs:
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        df = expected_pairs(sf_dir)
        path = f"/root/repo/fixtures/substring_winnow_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} pairs")


if __name__ == "__main__":
    main()
