"""Hyperplane-LSH top-k oracle fixture generator.

``lsh_bucket_topk`` (operators/ann.py) is plane-matrix-dependent: candidates
are pairs sharing a sign-pattern bucket in any of ``N_TABLES`` random
hyperplane tables, so the result cannot be recomputed by DuckDB from the
embeddings alone.  Same treatment as simhash and winnowed-substring: an
**independent, Spark-free** naive reimplementation computes the expected
(query_id, rank, neighbor_id) rows, committed as a parquet fixture the
oracle reads via ``read_parquet``; tests/test_lsh_topk_oracle.py regenerates
and asserts both non-staleness and engine agreement.

Independence: the plane matrix is a frozen contract value — re-derived here
from the public numpy PCG64 spec (``default_rng(SEED).standard_normal``)
with a hard-coded checksum guard (generator drift fails loudly instead of
silently agreeing), NOT imported from the engine.  Bucketing, candidate
expansion and ranking are naive per-vector loops written against the
docstring spec, not the engine's batched matmul + DataFrame joins.

The companion ``ivf_topk`` has its own fixture oracle
(tools/make_ivf_fixture.py) since the round-3 determinism rewrite made its
k-means partitioning-independent (fixed-point int64 accumulation).

Usage: python tools/make_lsh_topk_fixture.py [sf_dir ...]
Writes fixtures/lsh_topk_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

# frozen contract parameters — match __spark_entry__.q_lsh_bucket_topk
SEED = 42
N_TABLES = 8
N_PLANES = 12
DIM = 64
K = 5
N_PROBES = 2  # multi-probe: base bucket + lowest-|margin| bit flip

# mirrors operators/ann._SIM_QUANT: margin magnitudes quantized before the
# probe-order sort so the engine's batched gemm and the per-plane dots here
# provably agree on which bit flips — change BOTH together
_SIM_QUANT = 1e12


def _planes() -> np.ndarray:
    """The frozen (N_TABLES*N_PLANES, DIM) plane matrix, re-derived from the
    public PCG64 stream and drift-guarded: if a future numpy changed the
    stream, the checksum trips instead of the fixture silently diverging
    from the engine's identically-derived matrix."""
    p = np.random.default_rng(SEED).standard_normal((N_TABLES * N_PLANES, DIM))
    checksum = float(np.abs(p).sum())
    expected = 4894.161901  # frozen at generation time, numpy 2.x PCG64
    if abs(checksum - expected) > 1e-5:
        raise AssertionError(
            f"plane-matrix checksum drifted: {checksum:.6f} != {expected:.6f} "
            "(numpy generator stream changed — regenerate ALL lsh fixtures "
            "and re-freeze, engine and fixture must move together)"
        )
    return p


def expected_topk(sf_dir: str) -> pd.DataFrame:
    """(query_id, rank, neighbor_id): naive reimplementation — per-vector
    bucket loops, dict-of-lists inverted index, per-query sort."""
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(v) for v in tab.column("vec_id").to_pylist()]
    vecs = [np.asarray(v, dtype=np.float64) for v in tab.column("embedding").to_pylist()]
    planes = _planes()

    # sign-pattern bucket per (vector, table), one naive dot per plane;
    # multi-probe: each vector's query keys are its own bucket plus the
    # Hamming-1 flips of its N_PROBES-1 lowest-|quantized margin| planes
    # (ties -> lower plane index, like the engine's stable argsort)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    probe_keys: dict[int, list[tuple[int, int]]] = {}
    for vid, v in zip(ids, vecs):
        mine = []
        for t in range(N_TABLES):
            key = 0
            qmargins = []
            for j in range(N_PLANES):
                d = float(np.dot(planes[t * N_PLANES + j], v))
                if d > 0.0:
                    key |= 1 << j
                qmargins.append(abs(round(d * _SIM_QUANT)))
            buckets[(t, key)].append(vid)
            mine.append((t, key))
            order = sorted(range(N_PLANES), key=lambda j: (qmargins[j], j))
            for j in order[: N_PROBES - 1]:
                mine.append((t, key ^ (1 << j)))
        probe_keys[vid] = mine

    cands: dict[int, set[int]] = defaultdict(set)
    for vid, keys in probe_keys.items():
        for tk in keys:
            for b in buckets.get(tk, ()):
                if b != vid:
                    cands[vid].add(b)

    byid = dict(zip(ids, vecs))
    norms = {vid: float(np.linalg.norm(v)) for vid, v in byid.items()}
    rows = []
    for qid in sorted(cands):
        scored = sorted(
            (
                (-float(np.dot(byid[qid], byid[nid])) / (norms[qid] * norms[nid]), nid)
                for nid in cands[qid]
            ),
        )
        for rank, (_, nid) in enumerate(scored[:K], start=1):
            rows.append((qid, rank, nid))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"]).astype("int64")


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs("/root/repo/fixtures", exist_ok=True)
    for sf_dir in sf_dirs:
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        df = expected_topk(sf_dir)
        path = f"/root/repo/fixtures/lsh_topk_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} rows")


if __name__ == "__main__":
    main()
