"""IVF top-k fixture oracle + partitioning-independence.

The round-3 determinism rewrite (fixed-point int64 centroid accumulation,
splitmix64 init) makes ivf_topk a pure function of (embeddings, params):
the committed fixture from the Spark-free naive reimplementation must match
a fresh regeneration AND the engine — and the engine must return identical
rows under different input partitionings (the north rule's same-answer-at-
N-and-4N-executors property, previously impossible with float partials)."""

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def test_fixture_not_stale():
    from tools.make_ivf_fixture import expected_topk

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/ivf_topk_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_ivf_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_topk(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def _spark_rows(spark, emb):
    from vid_dup_finder_lib_spark.operators.ann import ivf_topk

    return {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(
            emb, k=5, dim=64, n_centroids=16, nprobe=4, n_iter=10, seed=42
        ).collect()
    }


def test_spark_matches_independent_reimplementation_and_partitioning(spark):
    from tools.make_ivf_fixture import expected_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    got1 = _spark_rows(spark, emb.repartition(1))
    gotN = _spark_rows(spark, emb.repartition(16))
    assert got1 == gotN  # partitioning-independence (exact, not approximate)

    exp = {
        (int(r.query_id), int(r.rank)): int(r.neighbor_id)
        for r in expected_topk(SF_SMALL).itertuples(index=False)
    }
    assert got1 == exp
    assert len(exp) > 0
