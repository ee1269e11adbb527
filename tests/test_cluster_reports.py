"""cluster_size_histogram + clustering_agreement + source_overlap_matrix.

The report operators added in round 4's seventh wave: component-size
distribution, pair-level clustering agreement (Rand-identity contingency
sums — no pair materialization), and the cross-source exact-dup matrix.
"""

from decimal import Decimal

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.components import (
    cluster_size_histogram,
    clustering_agreement,
)
from vid_dup_finder_lib_spark.operators.dedup import source_overlap_matrix


def _assign(spark, rows):
    return spark.createDataFrame(rows, "id long, component long")


def test_size_histogram_basic(spark):
    # clusters: {1,2,3} -> size 3, {10,11} and {20,21} -> size 2 (x2)
    cc = _assign(
        spark,
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
    )
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(cc).collect()
    }
    assert got == {3: (1, 3), 2: (2, 4)}


def test_size_histogram_singleton_bucket(spark):
    cc = _assign(spark, [(1, 1), (2, 1)])
    total = spark.createDataFrame([(5,)], "n_total long")
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(cc, n_total_docs=total).collect()
    }
    # 5 docs total, 2 clustered -> 3 singletons; invariant: sizes sum to corpus
    assert got == {2: (1, 2), 1: (3, 3)}
    assert sum(size * n for size, (n, _) in got.items()) == 5
    # all docs clustered -> no size-1 bucket row
    total2 = spark.createDataFrame([(2,)], "n_total long")
    got2 = {
        r["cluster_size"]: r["n_clusters"]
        for r in cluster_size_histogram(cc, n_total_docs=total2).collect()
    }
    assert got2 == {2: 1}


def test_agreement_identical_clusterings(spark):
    cc = _assign(spark, [(1, 1), (2, 1), (3, 3), (4, 3), (5, 3)])
    row = clustering_agreement(cc, cc).collect()[0]
    # C(2,2)=1 + C(3,2)=3 -> 4 pairs on both sides, all agreeing
    assert row["n_docs"] == 5
    assert row["pairs_a"] == Decimal(4)
    assert row["pairs_b"] == Decimal(4)
    assert row["pairs_both"] == Decimal(4)
    assert row["precision_ppm"] == 1_000_000
    assert row["recall_ppm"] == 1_000_000


def test_agreement_refinement_and_singletons(spark):
    # loose: one 4-cluster; tight: split into {1,2} + {3,4} minus doc 4
    # (doc 4 lost all edges -> absent from tight = singleton there)
    loose = _assign(spark, [(1, 1), (2, 1), (3, 1), (4, 1)])
    tight = _assign(spark, [(1, 1), (2, 1), (3, 3)])
    row = clustering_agreement(loose, tight).collect()[0]
    # loose pairs: C(4,2)=6; tight pairs: C(2,2)=1 ({3} and {4} contribute 0)
    # contingency: cell (1,1) has {1,2} -> 1 agreeing pair
    assert row["n_docs"] == 4
    assert row["pairs_a"] == Decimal(6)
    assert row["pairs_b"] == Decimal(1)
    assert row["pairs_both"] == Decimal(1)
    assert row["precision_ppm"] == 1_000_000  # every tight pair is in loose
    assert row["recall_ppm"] == 166_666  # floor(1e6 / 6)


def test_agreement_disjoint_node_sets(spark):
    # no shared docs at all: every doc is a singleton on the other side
    a = _assign(spark, [(1, 1), (2, 1)])
    b = _assign(spark, [(10, 10), (11, 10)])
    row = clustering_agreement(a, b).collect()[0]
    assert row["n_docs"] == 4
    assert row["pairs_a"] == Decimal(1)
    assert row["pairs_b"] == Decimal(1)
    assert row["pairs_both"] == Decimal(0)
    assert row["precision_ppm"] == 0 and row["recall_ppm"] == 0


def test_agreement_is_symmetric_under_swap(spark):
    a = _assign(spark, [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)])
    b = _assign(spark, [(1, 1), (2, 1), (3, 3), (4, 3), (6, 6), (7, 6)])
    ab = clustering_agreement(a, b).collect()[0]
    ba = clustering_agreement(b, a).collect()[0]
    assert ab["pairs_both"] == ba["pairs_both"]
    assert ab["pairs_a"] == ba["pairs_b"] and ab["pairs_b"] == ba["pairs_a"]
    assert ab["precision_ppm"] == ba["recall_ppm"]
    assert ab["recall_ppm"] == ba["precision_ppm"]


def test_agreement_ppm_floor_is_exact_near_one(spark):
    """Pin the ppm floor against Spark's decimal-division HALF_UP rounding.

    Construction: pairs_b = C(2000,2) + 1001*C(2,2) = 1_999_000 + 1_001 =
    2_000_001 and pairs_both = 2, so the true precision ratio is
    2_000_000/2_000_001 ppm — fractional part 0.9999995..., within 5e-7 of
    1.  A decimal(38,6) division rounds that to 1.000000 BEFORE floor and
    reports 1 ppm; the exact integer `div` must report 0.
    """
    big = [(i, 0) for i in range(2000)]  # C(2000,2) = 1_999_000 pairs
    twos = [
        (2000 + 2 * i + k, 1000 + i) for i in range(1001) for k in (0, 1)
    ]  # 1001 clusters of size 2 -> 1_001 pairs
    b = _assign(spark, big + twos)
    # A co-clusters exactly two of B's size-2 clusters; everything else is
    # absent from A (singleton there) -> pairs_both = 2, pairs_a = 2
    a = _assign(spark, [(2000, 1), (2001, 1), (2002, 2), (2003, 2)])
    row = clustering_agreement(a, b).collect()[0]
    assert row["pairs_b"] == Decimal(2_000_001)
    assert row["pairs_both"] == Decimal(2)
    # precision = pairs_both div pairs_b = floor(2e6/2_000_001), NOT the
    # HALF_UP-rounded 1
    assert row["precision_ppm"] == 0
    assert row["recall_ppm"] == 1_000_000  # pairs_both div pairs_a = 2e6/2


def test_agreement_string_url_ids(spark):
    """Native string url ids must key the contingency directly: a long cast
    would null every id, collapsing all docs into one cell and silently
    reporting garbage (ADVICE r4)."""
    a = spark.createDataFrame(
        [
            ("http://a.example/1", "http://a.example/1"),
            ("http://a.example/2", "http://a.example/1"),
            ("http://b.example/9", "http://b.example/9"),
        ],
        "id string, component string",
    )
    b = spark.createDataFrame(
        [
            ("http://a.example/1", "k1"),
            ("http://a.example/2", "k1"),
            ("http://b.example/9", "k2"),
        ],
        "id string, component string",
    )
    row = clustering_agreement(a, b).collect()[0]
    assert row["n_docs"] == 3
    assert row["pairs_a"] == Decimal(1)
    assert row["pairs_b"] == Decimal(1)
    assert row["pairs_both"] == Decimal(1)
    assert row["precision_ppm"] == 1_000_000
    assert row["recall_ppm"] == 1_000_000


def test_source_overlap_matrix_semantics(spark):
    docs = spark.createDataFrame(
        [
            # srcA doc 1 duplicated in srcB (2 copies) and srcC
            (1, "srcA", "same text"),
            (2, "srcB", "same text"),
            (3, "srcB", "same text"),
            (4, "srcC", "same text"),
            # unique docs
            (5, "srcA", "only in a"),
            (6, "srcB", "only in b"),
            # null text never matches anything
            (7, "srcA", None),
        ],
        "doc_id long, source string, text string",
    )
    rows = source_overlap_matrix(docs).collect()
    got = {(r["source_a"], r["source_b"]): (r["n_docs_a"], r["n_overlap"]) for r in rows}
    assert got == {
        ("srcA", "srcB"): (3, 1),  # doc 1 only (5 unique, 7 null)
        ("srcA", "srcC"): (3, 1),
        ("srcB", "srcA"): (3, 2),  # docs 2 AND 3 both have a copy in srcA
        ("srcB", "srcC"): (3, 2),
        ("srcC", "srcA"): (1, 1),
        ("srcC", "srcB"): (1, 1),
    }


def test_source_overlap_matrix_no_overlap_is_empty(spark):
    docs = spark.createDataFrame(
        [(1, "srcA", "alpha"), (2, "srcB", "beta")],
        "doc_id long, source string, text string",
    )
    assert source_overlap_matrix(docs).count() == 0
