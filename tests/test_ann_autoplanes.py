"""Auto bucket-geometry for hyperplane LSH (ann.auto_n_planes).

The scaling sweep measured the failure mode directly: at a FIXED plane
count the ANN phase's in-bucket pair work grows quadratically with corpus
size (bench_logs/scale_r5_s12.md — 41% -> 65% -> 71% of the N=2 wall
across 2x/4x/8x input).  ``n_planes="auto"`` pins expected bucket
occupancy, so candidate work grows ~linearly.  These tests pin:

1. the sizing math (constant-occupancy formula, clamps, errors);
2. **candidate-work linearity**: an 8x corpus grows the bucket-join
   candidate count ~8x under auto geometry, vs ~64x under the quadratic
   regime a fixed plane count produces;
3. **recall holds**: planted near-dup pairs stay in top-1 at BOTH corpus
   sizes under auto geometry (multi-probe compensating the extra planes);
4. the opt-in contract: default (fixed 12) plans are untouched, and
   ``n_planes="auto"`` returns the same schema.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.ann import (
    auto_n_planes,
    hyperplane_bucket_keys,
    lsh_bucket_topk,
)

DIM = 16


def test_auto_n_planes_math():
    # occupancy target hit exactly on powers of two
    assert auto_n_planes(64 * 4096, target_bucket_size=64) == 12
    assert auto_n_planes(8 * (1 << 9), target_bucket_size=8) == 9
    # monotone in n, never decreasing
    sizes = [auto_n_planes(n, target_bucket_size=8) for n in (1, 10**3, 10**6, 10**9)]
    assert sizes == sorted(sizes)
    # clamps
    assert auto_n_planes(0) == 8
    assert auto_n_planes(100, target_bucket_size=64, lo=8) == 8
    assert auto_n_planes(10**18, target_bucket_size=1, hi=24) == 24
    with pytest.raises(ValueError):
        auto_n_planes(100, target_bucket_size=0)


def _corpus(spark, n, seed):
    """n random unit-ish vectors + a planted near-dup for every 100th id."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, DIM))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    planted = [
        (int(1_000_000 + i), [float(x * (1.001 if j % 4 == 0 else 1.0)) for j, x in enumerate(base[i])])
        for i in range(0, n, 100)
    ]
    df = spark.createDataFrame(rows + planted, "vec_id: long, embedding: array<double>")
    return df, [(i, 1_000_000 + i) for i in range(0, n, 100)]


def _n_candidates(keys):
    base = keys.where(F.col("probe_idx") == 0)
    return (
        keys.alias("a")
        .join(base.alias("b"), ["table_id", "bucket"])
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id"), F.col("b.id"))
        .distinct()
        .count()
    )


def test_candidate_work_linear_under_auto_geometry(spark):
    """8x corpus -> ~8x candidates with auto planes (vs ~64x at fixed p)."""
    small, _ = _corpus(spark, 2_000, seed=1)
    large, _ = _corpus(spark, 16_000, seed=2)
    tgt = 8
    p_small = auto_n_planes(2_000, target_bucket_size=tgt)
    p_large = auto_n_planes(16_000, target_bucket_size=tgt)
    assert p_large == p_small + 3  # 8x corpus -> +3 planes, same occupancy

    def cands(df, p):
        return _n_candidates(
            hyperplane_bucket_keys(df, DIM, n_tables=4, n_planes=p, seed=7)
        )

    c_small = cands(small, p_small)
    c_large_auto = cands(large, p_large)
    c_large_fixed = cands(large, p_small)  # the quadratic regime
    growth_auto = c_large_auto / max(c_small, 1)
    growth_fixed = c_large_fixed / max(c_small, 1)
    # auto stays near the linear 8x; the fixed geometry is far above it
    assert growth_auto < 20, (c_small, c_large_auto)
    assert growth_fixed > 2.5 * growth_auto, (growth_fixed, growth_auto)


def test_recall_holds_across_sizes_under_auto(spark):
    for n, seed in ((2_000, 11), (16_000, 12)):
        df, pairs = _corpus(spark, n, seed=seed)
        top = lsh_bucket_topk(
            df, k=1, dim=DIM, n_tables=8, n_planes="auto", seed=42,
            n_probes=2, target_bucket_size=8,
        )
        got = {r.query_id: r.neighbor_id for r in top.where(F.col("rank") == 1).collect()}
        missed = [(a, b) for a, b in pairs if got.get(a) != b and got.get(b) != a]
        assert not missed, f"n={n}: {len(missed)}/{len(pairs)} planted pairs missed"


def test_auto_is_opt_in_and_schema_stable(spark):
    df, _ = _corpus(spark, 500, seed=3)
    fixed = lsh_bucket_topk(df, k=2, dim=DIM, n_planes=12, seed=42)
    auto = lsh_bucket_topk(df, k=2, dim=DIM, n_planes="auto", seed=42)
    assert fixed.columns == auto.columns == ["query_id", "rank", "neighbor_id", "cosine"]
    with pytest.raises(ValueError):
        lsh_bucket_topk(df, k=2, dim=DIM, n_planes=3.5, seed=42)
