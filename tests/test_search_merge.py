"""api.search_merge: two independently-clustered disjoint corpora merged
via cross edges + star contraction must equal from-scratch search over the
union — including clusters spanning the split and the length-heterogeneous
band case; overlapping ids refuse."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators.components import connected_components
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore

CFG = SigConfig(num_perms=128, lsh_bands=64, seed=42)
TOL = 0.100


def _cc_of(docs):
    return connected_components(api.find_edges(docs, TOL, CFG))


def _asgn(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _store_of(spark, docs, root):
    store = PartitionedSignatureStore(str(root), CFG, num_buckets=4)
    store.write_full(
        build_signatures(docs, CFG, "url", "text").localCheckpoint(eager=True)
    )
    return store


def test_merge_equals_full_search(spark, tmp_path):
    cb = CorpusBuilder(seed=61)
    clusters = cb.make_clusters(
        num_clusters=3, first_size=4, size_step=1, intra_d=25, inter_d=300,
        doclen=500,
    )
    cb.add_singletons(2, 300, 400, site=9)
    all_docs = cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)
    # split so cluster 0 lives wholly in A, cluster 2 wholly in B, and
    # cluster 1 SPANS the split (2 members each side)
    b_urls = set(clusters[2]) | set(sorted(clusters[1])[:2])
    cond = F.col("url").isin(*sorted(b_urls))
    docs_a = all_docs.where(~cond).localCheckpoint(eager=True)
    docs_b = all_docs.where(cond).localCheckpoint(eager=True)

    store_a = _store_of(spark, docs_a, tmp_path / "a")
    store_b = _store_of(spark, docs_b, tmp_path / "b")
    prev_a = _cc_of(docs_a).localCheckpoint(eager=True)
    prev_b = _cc_of(docs_b).localCheckpoint(eager=True)

    got = _asgn(api.search_merge(store_a, prev_a, store_b, prev_b, TOL, CFG))
    want = _asgn(_cc_of(all_docs))
    assert got == want
    # the spanning cluster really did need a cross-side merge
    span = {want[u] for u in clusters[1]}
    assert len(span) == 1
    assert len({_asgn(prev_a).get(u) or _asgn(prev_b).get(u) for u in clusters[1]}) > 1
    # store A grew by exactly B's rows (the whole union corpus)
    assert store_a.read(spark).count() == all_docs.count()


def test_merge_length_heterogeneous_cross_pair(spark, tmp_path):
    """The (1.05, 1.10] band case across the split: merge must keep it."""
    cb = CorpusBuilder(seed=62)
    base = cb.base_tokens(400)
    cb.add_doc("https://m.example/a", base)
    cb.add_doc("https://m.example/b", base + cb.base_tokens(30))
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    docs_a = docs.where(F.col("url").endswith("/a"))
    docs_b = docs.where(F.col("url").endswith("/b"))
    store_a = _store_of(spark, docs_a, tmp_path / "a")
    store_b = _store_of(spark, docs_b, tmp_path / "b")
    got = _asgn(
        api.search_merge(
            store_a, _cc_of(docs_a), store_b, _cc_of(docs_b), TOL, CFG
        )
    )
    assert got == _asgn(_cc_of(docs)) and len(got) == 2


def test_merge_refuses_overlapping_ids(spark, tmp_path):
    cb = CorpusBuilder(seed=63)
    cb.add_singletons(3, 300, 400, site=1)
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    store_a = _store_of(spark, docs, tmp_path / "a")
    store_b = _store_of(spark, docs.limit(2), tmp_path / "b")
    empty = spark.createDataFrame([], "id string, component string")
    with pytest.raises(ValueError, match="disjoint"):
        api.search_merge(store_a, empty, store_b, empty, TOL, CFG)
