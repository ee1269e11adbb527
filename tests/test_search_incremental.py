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


def test_job_cli_incremental_add(spark, tmp_path):
    """--incremental-add folds a new batch against an existing checkpoint
    and writes the updated assignment; equals a full job over the union;
    read-only on the store unless --incremental-commit."""
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=95)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=25, inter_d=300,
        doclen=600,
    )
    all_docs = cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)
    urls = sorted(r["url"] for r in all_docs.select("url").collect())
    batch_urls = {urls[0], urls[-1]}
    old_docs = all_docs.where(~F.col("url").isin(*batch_urls))
    new_docs = all_docs.where(F.col("url").isin(*batch_urls))

    old_path = str(tmp_path / "old_docs")
    new_path = str(tmp_path / "new_docs")
    union_path = str(tmp_path / "union_docs")
    old_docs.write.parquet(old_path)
    new_docs.write.parquet(new_path)
    all_docs.write.parquet(union_path)

    ckpt = str(tmp_path / "ckpt")
    assert job.main([
        "--docs", old_path, "--checkpoint", ckpt, "--tolerance", "0.100",
    ]) == 0
    store_manifest = (tmp_path / "ckpt" / "signatures" / "_manifest.json")
    before = store_manifest.read_text()

    inc_out = str(tmp_path / "inc_groups")
    assert job.main([
        "--incremental-add", new_path, "--checkpoint", ckpt,
        "--tolerance", "0.100", "--output", inc_out,
    ]) == 0
    # read-only fold: the store manifest is untouched
    assert store_manifest.read_text() == before

    full_ckpt = str(tmp_path / "ckpt_full")
    full_out = str(tmp_path / "full_groups")
    assert job.main([
        "--docs", union_path, "--checkpoint", full_ckpt,
        "--tolerance", "0.100", "--output", full_out,
    ]) == 0
    got = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(inc_out).collect()
    }
    want = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(full_out).collect()
    }
    assert got == want and len(got) == 9

    # committing grows the store by the batch
    assert job.main([
        "--incremental-add", new_path, "--checkpoint", ckpt,
        "--tolerance", "0.100", "--output", inc_out, "--incremental-commit",
    ]) == 0
    assert store_manifest.read_text() != before
    with pytest.raises(ValueError, match="additive-only"):
        job.main([
            "--incremental-add", new_path, "--checkpoint", ckpt,
            "--tolerance", "0.100", "--output", inc_out,
        ])


def test_incremental_empty_batch_is_noop(spark, tmp_path):
    """A daily batch can legitimately be empty: the fold must return the
    previous assignment unchanged and leave the store untouched."""
    cb = CorpusBuilder(seed=96)
    cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=20, inter_d=200,
        doclen=500,
    )
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    store = PartitionedSignatureStore(str(tmp_path / "store"), CFG, num_buckets=4)
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures

    store.write_full(build_signatures(docs, CFG, "url", "text"))
    prev = _cc_of(docs).localCheckpoint(eager=True)
    empty = docs.limit(0)
    got = {
        r["id"]: r["component"]
        for r in api.search_incremental(empty, store, prev, TOL, CFG).collect()
    }
    want = {r["id"]: r["component"] for r in prev.collect()}
    assert got == want
    assert store.read(spark).count() == 4


def test_incremental_parity_length_heterogeneous_neardups(spark, tmp_path):
    """Length ratios in (1.05, 1.10]: the J3 ref-centric ±5% band would
    silently drop the old-new cross edge that from-scratch self-search
    (symmetric 1.10 band) keeps — search_incremental must use the SELF
    band (refs_edges_from_signatures(length_band='self'))."""
    cb = CorpusBuilder(seed=71)
    base = cb.base_tokens(400)
    cb.add_doc("https://x.example/a", base)
    cb.add_doc("https://x.example/b", base + cb.base_tokens(30))  # ratio 1.075
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    old_docs = docs.where(F.col("url").endswith("/a"))
    new_docs = docs.where(F.col("url").endswith("/b"))

    from vid_dup_finder_lib_spark.operators.signatures import build_signatures

    store = PartitionedSignatureStore(str(tmp_path / "store"), CFG, num_buckets=4)
    store.write_full(build_signatures(old_docs, CFG, "url", "text"))
    prev = _cc_of(old_docs)  # single doc, no edges -> empty assignment

    got = {
        r["id"]: r["component"]
        for r in api.search_incremental(new_docs, store, prev, TOL, CFG).collect()
    }
    want = {
        r["id"]: r["component"]
        for r in _cc_of(docs).collect()
    }
    assert want == {
        "https://x.example/a": "https://x.example/a",
        "https://x.example/b": "https://x.example/a",
    }, "fixture regression: the pair must be a from-scratch near-dup"
    assert got == want
