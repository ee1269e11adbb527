"""Deterministic corpus splits + near-dup leakage audit.

The reason a training pipeline runs dedup at all is eval integrity: a
train/test split drawn per DOCUMENT leaks whenever a near-dup pair
straddles the boundary (the test doc is "novel" in name only).  This
module provides the two split constructions and the audit that
distinguishes them:

* ``hash_split`` — the naive per-doc split (deterministic md5 bucketing,
  reproducible across engines and runs; what most pipelines do first);
* ``cluster_coherent_split`` — the correct construction: the split key is
  the near-dup CLUSTER label, so every verified pair lands wholly inside
  one split by construction (singletons key on their own id and keep the
  same marginal fractions);
* ``split_leakage`` — the audit: per unordered split pair, how many
  verified near-dup edges cross the boundary.  Zero for the
  cluster-coherent split (test-pinned), nonzero for the per-doc split on
  any corpus with dups.

Everything is md5-prefix integer arithmetic (the repo's cross-engine
reproducibility discipline — featurize.py notes) — no RNG state, no
floats: a split is a pure function of (salt, id), so adding documents
never reshuffles existing ones (the property that makes splits stable
across incremental corpus growth).

Scale shape: hash_split is pure codegen per row; cluster_coherent_split
is one left join of docs onto the (already tiny per-doc) assignment;
split_leakage is two id-joins + one low-cardinality aggregation.  No
windows, no collects, no pair explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PPM = 1_000_000


def _check_fractions(fractions: list[tuple[str, int]]) -> None:
    if not fractions:
        raise ValueError("need >= 1 split fraction")
    total = sum(p for _, p in fractions)
    if total != _PPM:
        raise ValueError(
            f"split fractions must sum to exactly {_PPM} ppm, got {total} "
            f"({fractions})"
        )
    if any(p <= 0 for _, p in fractions):
        raise ValueError(f"every split fraction must be positive: {fractions}")
    names = [n for n, _ in fractions]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")


def _bucket_ppm(key: Column, salt: str) -> Column:
    """Deterministic [0, 1e6) bucket of a key: md5-prefix integer mod 1e6
    (cross-engine reproducible; same trick as featurize.token_bucket)."""
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _PPM).cast("int")


def _split_expr(bucket: Column, fractions: list[tuple[str, int]]) -> Column:
    expr = None
    acc = 0
    for name, ppm in fractions:
        acc += ppm
        cond = bucket < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def hash_split(
    docs: DataFrame,
    fractions: list[tuple[str, int]],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Per-DOC deterministic split: ``(id, split)``.  Reproducible, stable
    under corpus growth — but leaks near-dup pairs across the boundary
    (run ``split_leakage`` to measure; use ``cluster_coherent_split`` to
    fix).  ``fractions`` are (name, ppm) summing to exactly 1e6."""
    _check_fractions(fractions)
    return docs.select(
        F.col(id_col).alias("id"),
        _split_expr(_bucket_ppm(F.col(id_col), salt), fractions).alias("split"),
    )


def cluster_coherent_split(
    docs: DataFrame,
    assignment: DataFrame,
    fractions: list[tuple[str, int]],
    id_col: str = "doc_id",
    assign_id_col: str = "id",
    component_col: str = "component",
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-free split: the bucket key is the near-dup cluster label
    (docs absent from ``assignment`` are singletons and key on their own
    id).  Every verified edge is intra-cluster, hence intra-split — the
    audit reads zero by construction, not by luck."""
    _check_fractions(fractions)
    a = assignment.select(
        F.col(assign_id_col).alias("__aid"),
        F.col(component_col).alias("__comp"),
    )
    joined = docs.select(F.col(id_col).alias("id")).join(
        a, F.col("id") == F.col("__aid"), "left"
    )
    key = F.coalesce(F.col("__comp"), F.col("id"))
    return joined.select(
        "id",
        _split_expr(_bucket_ppm(key, salt), fractions).alias("split"),
    )


def split_leakage(
    edges: DataFrame,
    split_assign: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Per unordered split pair: verified near-dup edges crossing the
    boundary — ``(split_a, split_b, n_pairs)`` with split_a < split_b,
    empty when no edge leaks.  The eval-integrity gate: a nonzero
    (train, test) row means test docs with training near-dups."""
    s = split_assign.select(F.col("id"), F.col("split"))
    tagged = (
        edges.select(id1, id2)
        .join(s.withColumnRenamed("split", "s1"), F.col(id1) == F.col("id"))
        .drop("id")
        .join(s.withColumnRenamed("split", "s2"), F.col(id2) == F.col("id"))
        .drop("id")
        .where(F.col("s1") != F.col("s2"))
    )
    return (
        tagged.groupBy(
            F.least("s1", "s2").alias("split_a"),
            F.greatest("s1", "s2").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
