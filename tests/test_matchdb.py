"""Match-DB semantics (FIXTURES.md §3 fx_matchdb): confirmed / falsepos
filtering, recall accounting, moved-id relink — match_db.rs behaviors as
joins."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators import matchdb
from vid_dup_finder_lib_spark.operators.grouping import cc_groups
from vid_dup_finder_lib_spark.operators.signatures import build_signatures

CFG = SigConfig(num_perms=128, lsh_bands=128, seed=42)


@pytest.fixture(scope="module")
def corpus(spark):
    # fx_dist_discrim shape: two clusters, sizes 12 and 15
    cb = CorpusBuilder(seed=31)
    urls = cb.make_clusters(
        num_clusters=2, first_size=12, size_step=3, intra_d=50, inter_d=150, doclen=1000
    )
    docs = cb.to_spark(spark).localCheckpoint()
    edges = api.find_edges(docs, tolerance=0.100, cfg=CFG)
    return docs, edges, urls


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "id1 string, id2 string"
    )


def test_remove_known_matches_leaves_other_cluster(spark, corpus):
    docs, edges, urls = corpus
    c1 = sorted(urls[0])
    confirmed = _pairs_df(spark, [(a, b) for a in c1 for b in c1 if a < b])
    residual = matchdb.remove_known_matches(edges, confirmed)
    groups = cc_groups(residual)
    sizes = sorted(Counter(r.cluster_id for r in groups.collect()).values())
    assert sizes == [15]  # only cluster 2 remains


def test_falsepos_edges_never_merge_clusters(spark, corpus):
    docs, edges, urls = corpus
    # poison: claim 5 cross-cluster pairs are dups, then mark them falsepos
    cross = [(urls[0][i], urls[1][i]) for i in range(5)]
    poison = _pairs_df(spark, cross)
    for name, dtype in edges.dtypes:
        if name not in ("id1", "id2"):
            poison = poison.withColumn(name, F.lit(0).cast(dtype))
    poisoned = edges.unionByName(poison.select(*edges.columns))
    merged = cc_groups(poisoned)
    assert len(set(r.cluster_id for r in merged.collect())) == 1  # sanity: poison merges

    cleaned = matchdb.remove_falsepos_edges(poisoned, _pairs_df(spark, cross))
    groups = cc_groups(cleaned)
    sizes = sorted(Counter(r.cluster_id for r in groups.collect()).values())
    assert sizes == [12, 15]


def test_recall_is_one_on_planted_truth(spark, corpus):
    docs, edges, urls = corpus
    confirmed = []
    for cluster in urls:
        confirmed += [(a, b) for a in cluster for b in cluster if a < b]
    m = matchdb.recall_metrics(edges.select("id1", "id2"), _pairs_df(spark, confirmed))
    row = m.collect()[0]
    assert row.confirmed_pairs == len(confirmed)
    assert row.missed_pairs == 0
    assert row.recall == 1.0  # the >=0.99 gate, exactly 1.0 here


def test_missed_matches_reports_unfound(spark, corpus):
    docs, edges, urls = corpus
    phantom = [("https://nowhere.example/1", "https://nowhere.example/2")]
    missed = matchdb.missed_matches(edges.select("id1", "id2"), _pairs_df(spark, phantom))
    assert missed.count() == 1


def test_moved_relink(spark):
    cb = CorpusBuilder(seed=32)
    cb.add_singletons(10, 500, 900, site=1)
    docs = cb.to_spark(spark).localCheckpoint()
    sigs = build_signatures(docs, CFG)
    old = sigs.select("id", "content_hash").limit(4)
    # simulate a move: those 4 ids renamed in the live corpus
    moved = docs.withColumn(
        "url",
        F.when(
            F.col("url").isin([r.id for r in old.collect()]),
            F.concat(F.lit("https://moved.example/"), F.md5("url")),
        ).otherwise(F.col("url")),
    )
    live_sigs = build_signatures(moved, CFG)
    relinked = matchdb.fix_moved_ids(live_sigs, old)
    rows = relinked.collect()
    assert len(rows) == 4
    assert all(r.new_id.startswith("https://moved.example/") for r in rows)


def test_validation_conflicts(spark):
    confirmed = _pairs_df(spark, [("a", "b"), ("c", "d")])
    falsepos = _pairs_df(spark, [("b", "a"), ("e", "f")])
    got = matchdb.validation_conflicts(confirmed, falsepos).collect()
    assert [(r.id1, r.id2) for r in got] == [("a", "b")]
