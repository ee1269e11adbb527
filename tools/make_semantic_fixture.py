"""Semantic-dedup (SemDeDup-style) oracle fixture generator.

Independent, Spark-free naive twin of ``operators/ann.semantic_dedup``:
k-means via make_ivf_fixture.naive_kmeans (shared frozen spec — splitmix64
init, fixed-point int64 sums), nearest-centroid assignment with the
first-max tie rule, then a per-cluster greedy prune in ascending vec_id
order using per-pair ``np.dot`` on individually-normalized vectors with
``_SIM_QUANT`` quantization before every comparison (the engine's batched
gemv provably agrees after quantization — the round-3 ADVICE contract).

Usage: python tools/make_semantic_fixture.py [sf_dir ...]
Writes fixtures/semantic_dedup_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from tools.make_ivf_fixture import _assign, _qsim, naive_kmeans  # noqa: E402

# frozen contract parameters — match __spark_entry__.q_semantic_dedup
SEED = 42
N_CENTROIDS = 16
N_ITER = 10
DIM = 64
SIM_THRESHOLD = 0.92
THR_Q = round(SIM_THRESHOLD * 1e12)


def derived_corpus(sf_dir: str) -> tuple[list[int], list[np.ndarray]]:
    """base ∪ planted near-dups: every vec_id % 3 == 0 gains a copy at
    vec_id + 100000 with every 8th component scaled by 1.01 — cosine to
    its base ≈ 0.9997, far above threshold, while organic within-cluster
    pairs top out near 0.42.  All arithmetic is float64 on exactly-widened
    float32 inputs, so Spark (array cast to double, transform * lit(1.01))
    and numpy produce bit-identical vectors."""
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(v) for v in tab.column("vec_id").to_pylist()]
    vecs = [np.asarray(v, dtype=np.float64) for v in tab.column("embedding").to_pylist()]
    out_ids = list(ids)
    out_vecs = list(vecs)
    for vid, v in zip(ids, vecs):
        if vid % 3 == 0:
            p = v.copy()
            p[0::8] = p[0::8] * 1.01
            out_ids.append(vid + 100000)
            out_vecs.append(p)
    return out_ids, out_vecs


def expected_semantic(sf_dir: str) -> pd.DataFrame:
    ids, vecs = derived_corpus(sf_dir)

    centroids = naive_kmeans(ids, vecs, N_CENTROIDS, N_ITER, SEED, DIM)
    assign = _assign(vecs, centroids)

    clusters: dict[int, list[int]] = defaultdict(list)
    for pos, cid in enumerate(assign):
        clusters[cid].append(pos)

    rows = []
    for cid, members in clusters.items():
        members.sort(key=lambda p: ids[p])
        kept: list[int] = []  # positions, ascending id
        for p in members:
            vp = vecs[p]
            vpn = vp / max(float(np.linalg.norm(vp)), 1e-12)
            pruner = None
            for q in kept:
                vq = vecs[q]
                vqn = vq / max(float(np.linalg.norm(vq)), 1e-12)
                if _qsim(float(np.dot(vpn, vqn))) > THR_Q:
                    pruner = ids[q]
                    break
            if pruner is None:
                kept.append(p)
                rows.append((ids[p], cid, True, None))
            else:
                rows.append((ids[p], cid, False, pruner))

    df = pd.DataFrame(rows, columns=["vec_id", "cluster_id", "kept", "dup_of"])
    df = df.sort_values("vec_id").reset_index(drop=True)
    return df.astype(
        {"vec_id": "int64", "cluster_id": "int32", "kept": "bool", "dup_of": "Int64"}
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    os.makedirs("/root/repo/fixtures", exist_ok=True)
    for sf_dir in sf_dirs:
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        df = expected_semantic(sf_dir)
        path = f"/root/repo/fixtures/semantic_dedup_{name}.parquet"
        df.to_parquet(path, index=False)
        n_pruned = int((~df["kept"]).sum())
        print(f"{path}: {len(df)} rows, {n_pruned} pruned")


if __name__ == "__main__":
    main()
