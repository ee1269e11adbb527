"""api.dedup_corpus: one-call fuzzy dedup with a survivor-rule knob."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder

CFG = SigConfig(lsh_bands=64, seed=42)


def _corpus(spark, seed):
    cb = CorpusBuilder(seed=seed)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    return cb.to_spark(spark, partitions=2).localCheckpoint()


def test_min_id_rule_keeps_one_per_cluster(spark):
    docs = _corpus(spark, 41)
    kept = api.dedup_corpus(docs, tolerance=0.100, cfg=CFG).localCheckpoint()
    groups = api.search(docs, tolerance=0.100, cfg=CFG, grouping="cc")
    n_total, n_clustered = docs.count(), groups.count()
    n_clusters = groups.select("cluster_id").distinct().count()
    assert kept.count() == n_clusters + (n_total - n_clustered)
    # survivors are the cluster min ids; all input columns preserved
    min_ids = {
        r["m"] for r in groups.groupBy("cluster_id").agg(F.min("id").alias("m")).collect()
    }
    kept_ids = {r["url"] for r in kept.collect()}
    assert min_ids <= kept_ids
    assert set(docs.columns) <= set(kept.columns)
    assert "cluster_size" in kept.columns
    # cluster_size lineage sums back to the corpus
    assert kept.agg(F.sum("cluster_size")).collect()[0][0] == n_total


def test_medoid_rule_same_cardinality_possibly_different_picks(spark):
    docs = _corpus(spark, 42)
    a = api.dedup_corpus(docs, tolerance=0.100, cfg=CFG, survivor_rule="min_id")
    b = api.dedup_corpus(docs, tolerance=0.100, cfg=CFG, survivor_rule="medoid")
    assert a.count() == b.count()  # one survivor per cluster either way
    # medoid picks are real members of the same clusters
    groups = api.search(docs, tolerance=0.100, cfg=CFG, grouping="cc")
    members = {r["id"] for r in groups.collect()}
    b_clustered = {
        r["url"] for r in b.where(F.col("cluster_size") > 1).collect()
    }
    assert b_clustered <= members


def test_unknown_rule_raises(spark):
    docs = _corpus(spark, 43)
    with pytest.raises(ValueError, match="survivor_rule"):
        api.dedup_corpus(docs, tolerance=0.1, cfg=CFG, survivor_rule="newest")


def test_quality_rule_picks_max_score_member(spark):
    """survivor_rule='quality': per cluster the kept doc is the max-score
    member (ties -> min id), lineage still sums to the corpus, and the
    default text-length score path runs when score_col is omitted."""
    docs = _corpus(spark, 44).withColumn(
        "q", (F.abs(F.xxhash64("url")) % 1000).cast("long")
    ).localCheckpoint()
    kept = api.dedup_corpus(
        docs, tolerance=0.100, cfg=CFG, survivor_rule="quality", score_col="q"
    ).localCheckpoint()
    groups = api.search(docs, tolerance=0.100, cfg=CFG, grouping="cc")
    gq = groups.join(docs.select(F.col("url").alias("id"), "q"), "id")
    best: dict = {}
    for r in gq.collect():
        key = (-r["q"], r["id"])
        if r["cluster_id"] not in best or key < best[r["cluster_id"]][0]:
            best[r["cluster_id"]] = (key, r["id"])
    want_clustered = {v[1] for v in best.values()}
    kept_clustered = {
        r["url"] for r in kept.where(F.col("cluster_size") > 1).collect()
    }
    assert kept_clustered == want_clustered
    n_total, n_clustered = docs.count(), groups.count()
    n_clusters = groups.select("cluster_id").distinct().count()
    assert kept.count() == n_clusters + (n_total - n_clustered)
    assert kept.agg(F.sum("cluster_size")).collect()[0][0] == n_total
    assert set(docs.columns) <= set(kept.columns)
    # default score (char length of text_col) when score_col omitted
    k2 = api.dedup_corpus(
        docs.drop("q"), tolerance=0.100, cfg=CFG, survivor_rule="quality"
    )
    assert k2.count() == kept.count()


def test_quality_rule_score_col_validation(spark):
    docs = _corpus(spark, 45)
    with pytest.raises(ValueError, match="score_col"):
        api.dedup_corpus(
            docs, tolerance=0.1, cfg=CFG, survivor_rule="quality",
            score_col="no_such_col",
        )
    with pytest.raises(ValueError, match="score_col"):
        api.dedup_corpus(
            docs.withColumn("q", F.lit(1)), tolerance=0.1, cfg=CFG,
            survivor_rule="min_id", score_col="q",
        )
