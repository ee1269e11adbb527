"""Deterministic splits + near-dup leakage audit."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.splits import (
    cluster_coherent_split,
    hash_split,
    split_leakage,
)

FR = [("train", 800_000), ("val", 100_000), ("test", 100_000)]


def test_hash_split_is_deterministic_and_stable_under_growth(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["id"]: r["split"] for r in hash_split(docs, FR).collect()}
    b = {r["id"]: r["split"] for r in hash_split(docs, FR).collect()}
    assert a == b
    # adding docs never reshuffles existing assignments
    grown = spark.range(4000).select(F.col("id").alias("doc_id"))
    g = {r["id"]: r["split"] for r in hash_split(grown, FR).collect()}
    assert all(g[i] == a[i] for i in a)
    # marginal fractions roughly honored (binomial, wide tolerance)
    n_train = sum(1 for s in a.values() if s == "train")
    assert 0.74 * 2000 < n_train < 0.86 * 2000
    assert set(a.values()) == {"train", "val", "test"}


def test_fraction_validation(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to exactly"):
        hash_split(docs, [("a", 500_000), ("b", 400_000)])
    with pytest.raises(ValueError, match="positive"):
        hash_split(docs, [("a", 1_000_000), ("b", 0)])
    with pytest.raises(ValueError, match="duplicate"):
        hash_split(docs, [("a", 500_000), ("a", 500_000)])


def test_cluster_coherent_split_has_zero_leakage(spark):
    # chain clusters spanning many docs: per-doc split leaks, cluster split
    # cannot (every edge intra-cluster by construction)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 400, 2)]
        + [(i, i + 2) for i in range(0, 400, 4)],
        "id1 long, id2 long",
    )
    from vid_dup_finder_lib_spark.operators.components import connected_components

    cc = connected_components(edges)
    docs = spark.range(500).select(F.col("id").alias("doc_id"))

    by_doc = hash_split(docs, FR)
    leak_doc = split_leakage(edges, by_doc)
    assert leak_doc.agg(F.sum("n_pairs")).collect()[0][0] > 0  # naive split leaks

    by_cluster = cluster_coherent_split(docs, cc, FR)
    assert split_leakage(edges, by_cluster).count() == 0

    # singletons (docs 400..499, no edges) still get split assignments
    got = by_cluster.where(F.col("id") >= 400)
    assert got.count() == 100
    assert got.where(F.col("split").isNull()).count() == 0

    # cluster members share one split
    joined = by_cluster.join(cc, "id").groupBy("component").agg(
        F.countDistinct("split").alias("k")
    )
    assert joined.where(F.col("k") > 1).count() == 0


def test_split_leakage_counts_exact(spark):
    split = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "val")],
        "id long, split string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id1 long, id2 long"
    )
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_leakage(edges, split).collect()
    }
    # (1,2): train-test; (1,3): intra; (2,3): test-train; (3,4): train-val
    assert got == {("test", "train"): 2, ("train", "val"): 1}
