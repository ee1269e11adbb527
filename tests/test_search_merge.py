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


def test_merge_many_equals_full_search(spark, tmp_path):
    """3-way merge in one job: clusters spanning every pair of shards must
    reunite; store 0 grows by both other shards; K<2 and overlaps refuse."""
    cb = CorpusBuilder(seed=64)
    clusters = cb.make_clusters(
        num_clusters=3, first_size=4, size_step=1, intra_d=25, inter_d=300,
        doclen=500,
    )
    cb.add_singletons(2, 300, 400, site=9)
    all_docs = cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)
    # shard 0: cluster0 + 1 member of cluster1; shard 1: rest of cluster1 +
    # 1 member of cluster2; shard 2: rest of cluster2 + the singletons —
    # clusters 1 and 2 each span a DIFFERENT shard pair
    c1, c2 = sorted(clusters[1]), sorted(clusters[2])
    in0 = set(clusters[0]) | {c1[0]}
    in1 = set(c1[1:]) | {c2[0]}
    conds = [
        F.col("url").isin(*sorted(in0)),
        F.col("url").isin(*sorted(in1)),
        ~F.col("url").isin(*sorted(in0 | in1)),
    ]
    shards = []
    for k, cond in enumerate(conds):
        docs_k = all_docs.where(cond).localCheckpoint(eager=True)
        store_k = _store_of(spark, docs_k, tmp_path / f"s{k}")
        shards.append((store_k, _cc_of(docs_k).localCheckpoint(eager=True)))

    got = _asgn(api.search_merge_many(shards, TOL, CFG))
    want = _asgn(_cc_of(all_docs))
    assert got == want
    for cl in (clusters[1], clusters[2]):
        assert len({want[u] for u in cl}) == 1
    assert shards[0][0].read(spark).count() == all_docs.count()

    with pytest.raises(ValueError, match="at least 2"):
        api.search_merge_many(shards[:1], TOL, CFG)
    with pytest.raises(ValueError, match="disjoint"):
        api.search_merge_many(
            [shards[0], shards[0]], TOL, CFG, update_store=False
        )


def test_job_cli_merge_with(spark, tmp_path):
    """--merge-with combines two independently-built shard checkpoints into
    one clustering equal to a full job over the union corpus; read-only on
    both stores unless --incremental-commit; corpus-global preprocessing
    flags refuse."""
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=97)
    clusters = cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=25, inter_d=300,
        doclen=600,
    )
    all_docs = cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)
    # cluster 1 spans the split: 2 members go to shard B with cluster 0's
    # complement, so only the merge's cross edges can reunite it
    b_urls = set(sorted(clusters[1])[:2])
    cond = F.col("url").isin(*sorted(b_urls))
    a_path, b_path, union_path = (
        str(tmp_path / n) for n in ("a_docs", "b_docs", "union_docs")
    )
    all_docs.where(~cond).write.parquet(a_path)
    all_docs.where(cond).write.parquet(b_path)
    all_docs.write.parquet(union_path)

    ckpt_a, ckpt_b = str(tmp_path / "ckpt_a"), str(tmp_path / "ckpt_b")
    for docs_path, ckpt in ((a_path, ckpt_a), (b_path, ckpt_b)):
        assert job.main([
            "--docs", docs_path, "--checkpoint", ckpt, "--tolerance", "0.100",
        ]) == 0
    manifest_a = tmp_path / "ckpt_a" / "signatures" / "_manifest.json"
    before = manifest_a.read_text()

    merge_out = str(tmp_path / "merge_groups")
    assert job.main([
        "--merge-with", ckpt_b, "--checkpoint", ckpt_a,
        "--tolerance", "0.100", "--output", merge_out,
    ]) == 0
    assert manifest_a.read_text() == before  # read-only without commit

    full_ckpt, full_out = str(tmp_path / "ckpt_full"), str(tmp_path / "full_groups")
    assert job.main([
        "--docs", union_path, "--checkpoint", full_ckpt,
        "--tolerance", "0.100", "--output", full_out,
    ]) == 0
    got = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(merge_out).collect()
    }
    want = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(full_out).collect()
    }
    assert got == want and len(got) == 9

    # corpus-global preprocessing refuses
    with pytest.raises(SystemExit, match="per-doc preprocessing only"):
        job.main([
            "--merge-with", ckpt_b, "--checkpoint", ckpt_a,
            "--tolerance", "0.100", "--output", merge_out,
            "--strip-boilerplate",
        ])

    # committing grows store A by B's rows
    assert job.main([
        "--merge-with", ckpt_b, "--checkpoint", ckpt_a,
        "--tolerance", "0.100", "--output", merge_out, "--incremental-commit",
    ]) == 0
    assert manifest_a.read_text() != before
    import json as _json

    manifest = _json.loads(manifest_a.read_text())
    assert sum(manifest["partition_rows"].values()) == all_docs.count()


def test_merge_refuses_overlapping_ids(spark, tmp_path):
    cb = CorpusBuilder(seed=63)
    cb.add_singletons(3, 300, 400, site=1)
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    store_a = _store_of(spark, docs, tmp_path / "a")
    store_b = _store_of(spark, docs.limit(2), tmp_path / "b")
    empty = spark.createDataFrame([], "id string, component string")
    with pytest.raises(ValueError, match="disjoint"):
        api.search_merge(store_a, empty, store_b, empty, TOL, CFG)
