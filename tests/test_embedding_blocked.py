"""embedding_neardup_pairs_blocked: exact parity with the cross-join form.

The blocked operator is the scale form of the exact cosine-threshold
self-join (block-nested-loop + BLAS Gram kernel, no cross-join / collect /
corpus broadcast).  Exactness claim: identical pair SET and cosines equal
to float64-summation-order noise vs the JVM-fold cross-join, at any block
count (block assignment must not affect the output).
"""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.ann import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_blocked,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs_map(df):
    return {(r.id1, r.id2): r.cosine for r in df.collect()}


def test_blocked_matches_crossjoin(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = _pairs_map(
        embedding_neardup_pairs(emb, 0.35).select(
            F.col("id1").cast("long").alias("id1"),
            F.col("id2").cast("long").alias("id2"),
            "cosine",
        )
    )
    blocked = _pairs_map(embedding_neardup_pairs_blocked(emb, 0.35, n_blocks=8))
    assert set(blocked) == set(exact)
    assert len(exact) > 0
    for k, v in blocked.items():
        assert abs(v - exact[k]) < 1e-9


def test_block_count_invariance(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    one = _pairs_map(embedding_neardup_pairs_blocked(emb, 0.35, n_blocks=1))
    five = _pairs_map(embedding_neardup_pairs_blocked(emb, 0.35, n_blocks=5))
    assert set(one) == set(five)
    for k, v in five.items():
        assert abs(v - one[k]) < 1e-9


def test_blocked_rejects_non_integral_ids(spark):
    df = spark.createDataFrame(
        [("u1", [1.0, 0.0]), ("u2", [1.0, 0.0])], "vec_id string, embedding array<float>"
    )
    with pytest.raises(Exception, match="integral ids"):
        embedding_neardup_pairs_blocked(df, 0.9, n_blocks=2).collect()


def test_blocked_rejects_bad_block_count(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="n_blocks"):
        embedding_neardup_pairs_blocked(emb, 0.35, n_blocks=0)
