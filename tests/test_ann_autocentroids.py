"""Auto centroid sizing for the IVF / SemDeDup paths.

Same scale defect class as the hyperplane geometry (test_ann_autoplanes):
a FIXED centroid count makes IVF candidate work ``~ n^2 * nprobe / k``
and the SemDeDup per-cluster prune ``O((n/k)^2)`` per task — both
quadratic in corpus size.  ``n_centroids="auto"`` sizes k = ~sqrt(n) for
IVF (probe work per query shrinks with corpus growth) and
k = ceil(n / target_cluster_size) for the prune (flat per-task cost).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.ann import (
    auto_n_centroids,
    auto_n_centroids_for_prune,
    ivf_topk,
    semantic_dedup,
)

DIM = 16


def test_auto_n_centroids_math():
    assert auto_n_centroids(10_000) == 100
    assert auto_n_centroids(10**12) == 65536  # hi clamp: driver model-state cap
    assert auto_n_centroids(10) == 16  # lo clamp
    assert auto_n_centroids(0) == 16
    sizes = [auto_n_centroids(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert sizes == sorted(sizes)


def test_auto_n_centroids_for_prune_math():
    assert auto_n_centroids_for_prune(4096 * 100, target_cluster_size=4096) == 100
    assert auto_n_centroids_for_prune(100, target_cluster_size=4096) == 16
    assert auto_n_centroids_for_prune(10**12, target_cluster_size=4096) == 65536
    with pytest.raises(ValueError):
        auto_n_centroids_for_prune(100, target_cluster_size=0)


def _clustered(spark, n, seed, noise=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((20, DIM)) * 3
    rows = [
        (int(i), [float(x) for x in centers[i % 20] + rng.standard_normal(DIM) * noise])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_ivf_auto_matches_fixed_at_equivalent_k(spark):
    """auto at n=2500 -> k=50; results equal an explicit k=50 run."""
    df = _clustered(spark, 2_500, seed=21)
    a = ivf_topk(df, k=1, dim=DIM, n_centroids="auto", nprobe=2, seed=42)
    b = ivf_topk(df, k=1, dim=DIM, n_centroids=50, nprobe=2, seed=42)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_semantic_auto_prune_lineage(spark):
    """auto centroids on a corpus where planted near-copies are the ONLY
    high-cosine pairs (random dim-64 vectors are near-orthogonal: organic
    cosine ~N(0, 1/64)), under a target_cluster_size that forces k above
    the lo clamp.  The prune must be selective (only planted copies go)
    and near-complete (a copy can only escape by landing across a k-means
    cluster boundary from its base — rare by construction)."""
    rng = np.random.default_rng(22)
    base = rng.standard_normal((1_000, 64))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(1_000)]
    planted = [
        (int(10_000 + i), [float(x * (1.001 if j % 4 == 0 else 1.0)) for j, x in enumerate(base[i])])
        for i in range(0, 1_000, 5)
    ]
    corpus = spark.createDataFrame(
        rows + planted, "vec_id: long, embedding: array<double>"
    ).localCheckpoint(eager=True)
    out = semantic_dedup(
        corpus, dim=64, sim_threshold=0.95, n_centroids="auto",
        target_cluster_size=50, seed=42,
    )
    rows_out = out.collect()
    pruned = {r.vec_id: r.dup_of for r in rows_out if not r.kept}
    n_planted_pruned = sum(
        1 for b in range(0, 1_000, 5) if pruned.get(b + 10_000) == b
    )
    assert n_planted_pruned >= 190, f"only {n_planted_pruned}/200 planted copies pruned to base"
    organic_pruned = [v for v in pruned if v < 10_000]
    assert len(organic_pruned) == 0, f"organic vectors pruned: {organic_pruned[:5]}"


def test_auto_is_opt_in(spark):
    df = _clustered(spark, 300, seed=23)
    with pytest.raises(ValueError):
        ivf_topk(df, k=1, dim=DIM, n_centroids=2.5)
    with pytest.raises(ValueError):
        semantic_dedup(df, dim=DIM, n_centroids="sqrt")
