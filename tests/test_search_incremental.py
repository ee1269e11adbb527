"""api.search_incremental: additive batch folding must equal from-scratch
search over the union corpus; non-additive batches refuse."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators.components import connected_components
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore

CFG = SigConfig(num_perms=128, lsh_bands=64, seed=42)
TOL = 0.100


def _cc_of(docs):
    return connected_components(api.find_edges(docs, TOL, CFG))


def test_incremental_equals_full_search(spark, tmp_path):
    cb = CorpusBuilder(seed=91)
    cb.make_clusters(
        num_clusters=2, first_size=5, size_step=2, intra_d=30, inter_d=300,
        doclen=800,
    )
    all_docs = cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)
    # batch = the last member of each cluster + 3 singletons; old = the rest
    urls = sorted(r["url"] for r in all_docs.select("url").collect())
    cb2 = CorpusBuilder(seed=92)
    cb2.add_singletons(3, 400, 600, site=9)
    extra = cb2.to_spark(spark, partitions=1)
    batch_urls = {urls[4], urls[-1]}
    old_docs = all_docs.where(~F.col("url").isin(*batch_urls))
    new_docs = all_docs.where(F.col("url").isin(*batch_urls)).unionByName(extra)

    store = PartitionedSignatureStore(str(tmp_path / "store"), CFG, num_buckets=8)
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures

    store.write_full(
        build_signatures(old_docs, CFG, "url", "text").localCheckpoint(eager=True)
    )
    prev = _cc_of(old_docs).localCheckpoint(eager=True)

    got = {
        r["id"]: r["component"]
        for r in api.search_incremental(new_docs, store, prev, TOL, CFG).collect()
    }
    want = {
        r["id"]: r["component"]
        for r in _cc_of(all_docs.unionByName(extra)).collect()
    }
    assert got == want
    # store grew by exactly the batch
    assert store.read(spark).count() == all_docs.count() + 3


def test_incremental_rejects_existing_ids(spark, tmp_path):
    cb = CorpusBuilder(seed=93)
    cb.add_singletons(4, 300, 400, site=1)
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    store = PartitionedSignatureStore(str(tmp_path / "store"), CFG, num_buckets=4)
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures

    store.write_full(build_signatures(docs, CFG, "url", "text"))
    prev = spark.createDataFrame([], "id string, component string")
    with pytest.raises(ValueError, match="additive-only"):
        api.search_incremental(docs.limit(1), store, prev, TOL, CFG)
