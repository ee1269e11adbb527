"""Semantic-dedup (SemDeDup-style) fixture oracle + partitioning
independence + valve.

Same contract as the IVF oracle: the committed fixture from the Spark-free
naive twin must match a fresh regeneration AND the engine, and the engine
must return identical rows under different input partitionings (quantized
similarities + deterministic k-means make the whole pipeline a pure
function of (embeddings, params))."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def test_fixture_not_stale():
    from tools.make_semantic_fixture import expected_semantic

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/semantic_dedup_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_semantic_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_semantic(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_planted_ground_truth():
    # every planted copy (+100000) pruned with dup_of = its base; every
    # base vector kept
    df = pd.read_parquet(f"/root/repo/fixtures/semantic_dedup_sf0.001.parquet")
    pruned = df[~df.kept]
    assert len(pruned) > 0
    assert (pruned.vec_id >= 100000).all()
    assert ((pruned.vec_id - pruned.dup_of) == 100000).all()
    assert df[df.vec_id < 100000].kept.all()


def _spark_rows(spark, corpus):
    from vid_dup_finder_lib_spark.operators.ann import semantic_dedup

    return {
        r.vec_id: (r.cluster_id, r.kept, r.dup_of)
        for r in semantic_dedup(
            corpus, dim=64, sim_threshold=0.92, n_centroids=16, n_iter=10, seed=42
        ).collect()
    }


def test_spark_matches_fixture_and_partitioning(spark):
    import __spark_entry__ as entry

    sdf = entry.q_semantic_dedup(spark, SF_SMALL)
    got = {r.vec_id: (r.cluster_id, r.kept, r.dup_of) for r in sdf.collect()}

    exp_df = pd.read_parquet("/root/repo/fixtures/semantic_dedup_sf0.001.parquet")
    exp = {
        int(r.vec_id): (
            int(r.cluster_id),
            bool(r.kept),
            None if pd.isna(r.dup_of) else int(r.dup_of),
        )
        for r in exp_df.itertuples(index=False)
    }
    assert got == exp

    # partitioning independence on the raw (unplanted) corpus
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    assert _spark_rows(spark, emb.repartition(1)) == _spark_rows(
        spark, emb.repartition(16)
    )


def test_cluster_valve(spark):
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.operators.ann import (
        SemanticClusterTooLarge,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    with pytest.raises(SemanticClusterTooLarge, match="valve"):
        semantic_dedup(emb, dim=64, n_centroids=4, max_cluster_size=10)
