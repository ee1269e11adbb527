"""IVF top-k oracle fixture generator.

``ivf_topk`` became fixture-oracle-able in round 3: the k-means update now
accumulates fixed-point int64 (exactly associative — centroids no longer
depend on partition order) and the init is a splitmix64 contract hash, so
the whole pipeline is a pure function of (embeddings, params).  This tool
is the **independent, Spark-free** naive reimplementation: splitmix64 in
plain Python integer arithmetic (not the engine's numpy-uint64 version),
per-vector assignment loops, Python-int centroid sums, dict inverted file.

Shared spec points reproduced bit-for-bit (documented in
operators/ann.kmeans_centroids): quantization ``np.round(v * 2^20)``,
centroid division ``int / float(cnt * 2^20)``, convergence
``np.allclose(..., atol=1e-9)``, init order (signed hash, id), argmax
first-max tie rule.

Usage: python tools/make_ivf_fixture.py [sf_dir ...]
Writes fixtures/ivf_topk_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

# frozen contract parameters — match __spark_entry__.q_ivf_topk
SEED = 42
N_CENTROIDS = 16
NPROBE = 4
N_ITER = 10
DIM = 64
K = 5
SCALE = 1 << 20
_MASK = (1 << 64) - 1


def splitmix64_py(x: int) -> int:
    """SplitMix64 finalizer in pure Python ints (independent of the
    engine's numpy formulation)."""
    z = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


# mirrors operators/ann._SIM_QUANT: similarities quantized to 1e-12 before
# argmax/argsort so the per-pair np.dot here and the engine's batched BLAS
# gemm (last-ulp kernel drift) provably agree — change BOTH together
_SIM_QUANT = 1e12


def _qsim(x: float) -> int:
    # np.round is round-half-even, same as Python's round on floats
    return round(x * _SIM_QUANT)


def _assign(vecs, centroids):
    """Nearest centroid by quantized cosine per vector; first-max tie rule."""
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    out = []
    for v in vecs:
        vn = v / max(np.linalg.norm(v), 1e-12)
        sims = [_qsim(float(np.dot(vn, c))) for c in cn]
        best, bi = sims[0], 0
        for i in range(1, len(sims)):
            if sims[i] > best:
                best, bi = sims[i], i
        out.append(bi)
    return out


def _probes(v, centroids, nprobe):
    """nprobe nearest centroids by quantized cosine, stable (ascending index
    on ties) like np.argsort(-quantized_sims)."""
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    vn = v / max(np.linalg.norm(v), 1e-12)
    sims = [_qsim(float(np.dot(vn, c))) for c in cn]
    order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
    return order[:nprobe]


def naive_kmeans(
    ids: list[int],
    vecs: list[np.ndarray],
    n_centroids: int = N_CENTROIDS,
    n_iter: int = N_ITER,
    seed: int = SEED,
    dim: int = DIM,
) -> np.ndarray:
    """The Spark-free k-means twin of operators/ann.kmeans_centroids
    (shared spec: splitmix64 init order, fixed-point int64 sums,
    allclose(atol=1e-9) convergence).  Also consumed by
    make_semantic_fixture.py."""
    # init: n_centroids smallest (signed splitmix64(id ^ seed), id)
    ranked = sorted(
        range(len(ids)), key=lambda i: (_signed(splitmix64_py(ids[i] ^ seed)), ids[i])
    )
    centroids = np.vstack([vecs[i] for i in ranked[:n_centroids]]).astype(np.float64)

    for _ in range(n_iter):
        assign = _assign(vecs, centroids)
        sums = [[0] * dim for _ in range(n_centroids)]
        counts = [0] * n_centroids
        for v, j in zip(vecs, assign):
            q = np.round(v * SCALE).astype(np.int64)
            counts[j] += 1
            row = sums[j]
            for i in range(dim):
                row[i] += int(q[i])
        new_centroids = centroids.copy()
        for j in range(n_centroids):
            if counts[j] > 0:
                denom = float(counts[j] * SCALE)
                new_centroids[j] = np.asarray([s / denom for s in sums[j]], dtype=np.float64)
        if np.allclose(new_centroids, centroids, atol=1e-9):
            centroids = new_centroids
            break
        centroids = new_centroids
    return centroids


def expected_topk(sf_dir: str) -> pd.DataFrame:
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(v) for v in tab.column("vec_id").to_pylist()]
    vecs = [np.asarray(v, dtype=np.float64) for v in tab.column("embedding").to_pylist()]

    centroids = naive_kmeans(ids, vecs)

    # inverted file (nprobe=1) + query-side probes
    file_side = defaultdict(list)
    for vid, v in zip(ids, vecs):
        file_side[_probes(v, centroids, 1)[0]].append(vid)

    byid = dict(zip(ids, vecs))
    norms = {vid: float(np.linalg.norm(v)) for vid, v in byid.items()}
    rows = []
    for qid, v in zip(ids, vecs):
        cand = set()
        for c in _probes(v, centroids, NPROBE):
            cand.update(file_side[c])
        cand.discard(qid)
        scored = sorted(
            (
                (-float(np.dot(byid[qid], byid[nid])) / (norms[qid] * norms[nid]), nid)
                for nid in cand
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
        path = f"/root/repo/fixtures/ivf_topk_{name}.parquet"
        df.to_parquet(path, index=False)
        print(f"{path}: {len(df)} rows")


if __name__ == "__main__":
    main()
