"""Hashed bag-of-words featurizer: dense/sparse form equality, norm
behavior, and the text -> vector -> ANN bridge."""

import pyspark.sql.functions as F

from vid_dup_finder_lib_spark.functions.featurize import (
    hashed_bow,
    hashed_bow_exploded,
    l2_normalize,
)

DOCS = [
    (1, "alpha beta gamma alpha"),
    (2, "beta beta delta"),
    (3, ""),          # empty doc: zero vector, no sparse rows
    (4, "alpha"),
    (5, None),        # null text: zero vector (NOT nulls), no sparse rows
]


def test_dense_equals_sparse(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    dim = 16
    dense = {
        r.doc_id: r.v
        for r in df.select("doc_id", hashed_bow(F.col("text"), dim).alias("v")).collect()
    }
    sparse = {}
    for r in hashed_bow_exploded(df, dim=dim).collect():
        sparse.setdefault(r.doc_id, {})[r.bucket] = r.cnt
    for doc_id, vec in dense.items():
        assert len(vec) == dim
        exp = sparse.get(doc_id, {})
        for b, c in enumerate(vec):
            assert c == exp.get(b, 0), (doc_id, b)
    assert sum(dense[1]) == 4 and sum(dense[3]) == 0
    assert dense[5] is not None and all(v == 0 for v in dense[5])


def test_l2_normalize_zero_safe(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", l2_normalize(hashed_bow(F.col("text"), 8)).alias("n")
        ).collect()
    }
    import math

    for doc_id, vec in out.items():
        norm = math.sqrt(sum(v * v for v in vec))
        if doc_id in (3, 5):
            assert norm == 0.0  # zero vector passes through, never NaN
        else:
            assert abs(norm - 1.0) < 1e-12


def test_text_to_ann_bridge(spark):
    """hashed vectors feed brute_force_topk directly: near-identical texts
    rank as each other's nearest neighbor."""
    from vid_dup_finder_lib_spark.operators.ann import brute_force_topk

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "entirely different content about spark plans and shuffles"),
        ],
        "doc_id long, text string",
    )
    vecs = docs.select(
        F.col("doc_id").alias("vec_id"),
        l2_normalize(hashed_bow(F.col("text"), 64)).alias("embedding"),
    )
    top = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(vecs, vecs, k=1).collect()
    }
    assert top[(1, 1)] == 2 and top[(2, 1)] == 1
