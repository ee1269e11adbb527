"""with_output_rank: distributed total-order rank (no single-partition
window, no unbounded driver collect — round-3 verdict item #2).

The driver-side collect scaled with DISTINCT KEY cardinality; the prefix-sum
rewrite collects only one row per shuffle partition.  These tests pin the
semantics (dense total order, direction, null placement, ties) on a
high-cardinality key — every row distinct, the exact shape the old
implementation handled worst.
"""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.grouping import with_output_rank


def _expected(rows, key, tie, descending):
    def sk(r):
        v = r[key]
        null = 1 if v is None else 0
        return (null, (-v if descending else v) if v is not None else 0, r[tie])

    return {r[tie]: i + 1 for i, r in enumerate(sorted(rows, key=sk))}


@pytest.mark.parametrize("descending", [True, False])
def test_high_cardinality_all_distinct_keys(spark, descending):
    # 5000 distinct key values — one aggregate row per input row, the case
    # where the old driver-side collect was O(n)
    df = spark.range(5000).select(
        F.col("id").alias("cluster_id"),
        ((F.col("id") * 7919) % 104729).alias("k"),  # distinct, scrambled
    ).repartition(16)
    got = {
        r.cluster_id: r.rank
        for r in with_output_rank(df, "k", tie_col="cluster_id", descending=descending).collect()
    }
    rows = [{"k": (i * 7919) % 104729, "cluster_id": i} for i in range(5000)]
    assert got == _expected(rows, "k", "cluster_id", descending)


@pytest.mark.parametrize("descending", [True, False])
def test_ties_nulls_and_duplicates(spark, descending):
    data = [
        (1, 10), (2, 10), (3, 5), (4, None), (5, 20), (6, None), (7, 5), (8, 20),
    ]
    df = spark.createDataFrame(data, "cluster_id long, k long").repartition(4)
    got = {
        r.cluster_id: r.rank
        for r in with_output_rank(df, "k", tie_col="cluster_id", descending=descending).collect()
    }
    rows = [{"cluster_id": c, "k": k} for c, k in data]
    exp = _expected(rows, "k", "cluster_id", descending)
    assert got == exp
    # nulls last in BOTH directions
    assert {got[4], got[6]} == {7, 8}


def test_rank_is_dense_total_order(spark):
    df = spark.range(300).select(
        F.col("id").alias("cluster_id"), (F.col("id") % 17).alias("k")
    ).repartition(8)
    ranks = sorted(
        r.rank for r in with_output_rank(df, "k", tie_col="cluster_id").collect()
    )
    assert ranks == list(range(1, 301))
