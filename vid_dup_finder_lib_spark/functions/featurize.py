"""Text featurization: hashed bag-of-words vectors, pure Spark expressions.

The bridge between the text side of the engine and the ANN family
(operators/ann.py): a deterministic, model-free embedding via the hashing
trick — token -> md5-prefix bucket in [0, dim), vector = per-bucket counts
(optionally L2-normalized doubles).  Enough to run embedding-cosine
near-dup / top-k over a corpus that has no model embeddings, and the
standard cheap featurizer for dedup-adjacent clustering.

Why md5-prefix instead of ``xxhash64``: the bucket function must be
reproducible OUTSIDE Spark (DuckDB oracle, fixture tools) — md5 is
cross-engine (the doc_fingerprint contract already relies on it) while
Spark's xxhash64 byte layout is engine-internal.

Two forms, same numbers:

* ``hashed_bow`` — scalar array expression (whole-stage codegen).  Cost is
  O(tokens × dim) comparisons per row; fine for dim ≲ 256.  For large dim
  use the exploded form.
* ``hashed_bow_exploded`` — (id, bucket, cnt) via explode + groupBy: one
  shuffle, linear work, any dim; also the natural sparse representation.

Equality of the two forms is pinned by tests/test_featurize.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions.text import normalize_text, tokens_col


def token_bucket(tok: Column, dim: int) -> Column:
    """Deterministic token -> [0, dim) bucket: first 8 md5 hex digits as an
    integer, mod dim (cross-engine reproducible)."""
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim).cast("int")


def hashed_bow(text: Column, dim: int = 64) -> Column:
    """array<long>[dim]: count of tokens landing in each bucket (the dense
    hashing-trick vector).  O(tokens × dim) per row — see module notes.
    Null text yields the ZERO vector (not an array of nulls), consistent
    with the sparse form emitting no rows for a token-less doc."""
    buckets = F.coalesce(
        F.transform(tokens_col(normalize_text(text)), lambda t: token_bucket(t, dim)),
        F.array().cast("array<int>"),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(buckets, lambda b: b == i)).cast("long"),
    )


def l2_normalize(vec: Column) -> Column:
    """array<long|double> -> unit-norm array<double> (zero vectors pass
    through as zeros, never NaN)."""
    dbl = F.transform(vec, lambda v: v.cast("double"))
    norm = F.sqrt(
        F.aggregate(dbl, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return F.when(norm == 0.0, dbl).otherwise(
        F.transform(dbl, lambda v: v / norm)
    )


def hashed_bow_exploded(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(<id_col>, bucket, cnt) sparse form: explode + groupBy — linear
    work, one shuffle, any dim.  Buckets with zero count are absent
    (sparse); the caller's id column keeps its name."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens_col(normalize_text(F.col(text_col)))).alias("tok"),
    )
    return (
        toks.select(id_col, token_bucket(F.col("tok"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
