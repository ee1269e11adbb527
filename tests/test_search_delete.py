"""api.search_delete / components.delete_components: removing docs must
equal from-scratch search over the remaining corpus — including bridge-doc
splits (the case no star merge can express), min-label deletions, and
whole-cluster removals — while unaffected components pass through
label-stable and the store shrinks O(delta)."""

import re

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators.components import (
    connected_components,
    delete_components,
)
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore

CFG = SigConfig(num_perms=128, lsh_bands=64, seed=42)
TOL = 0.100  # radius 100 token substitutions


def _cc_of(docs):
    return connected_components(api.find_edges(docs, TOL, CFG))


def _asgn(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _store_of(spark, docs, root, buckets=8):
    store = PartitionedSignatureStore(str(root), CFG, num_buckets=buckets)
    store.write_full(
        build_signatures(docs, CFG, "url", "text").localCheckpoint(eager=True)
    )
    return store


def _bridge_corpus(spark):
    """{A, A2} -- B -- {C, C2}: every edge runs through B (pairwise
    distances 60/80 inside each wing and to B, 120+ across wings at
    radius 100), plus one untouched clique cluster and singletons."""
    cb = CorpusBuilder(seed=77)
    base = cb.base_tokens(800)
    a = cb.member_at_distance(base, 60)
    c = cb.member_at_distance(base, 60)
    cb.add_doc("https://bridge.example/a", a)
    cb.add_doc("https://bridge.example/a2", cb.member_at_distance(a, 20))
    cb.add_doc("https://bridge.example/b", base)
    cb.add_doc("https://bridge.example/c", c)
    cb.add_doc("https://bridge.example/c2", cb.member_at_distance(c, 20))
    cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=30, inter_d=300,
        doclen=500,
    )
    cb.add_singletons(2, 300, 400, site=9)
    return cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)


def test_delete_bridge_splits_and_matches_full(spark, tmp_path):
    docs = _bridge_corpus(spark)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store")

    dels = spark.createDataFrame(
        [("https://bridge.example/b",)], "id string"
    )
    got = api.search_delete(dels, store, prev, TOL, CFG, keep_isolated=False)
    remaining = docs.where(F.col("url") != "https://bridge.example/b")
    assert _asgn(got) == _asgn(_cc_of(remaining))

    # the bridge component actually split into two
    wings = {
        comp
        for u, comp in _asgn(got).items()
        if u.startswith("https://bridge.example/")
    }
    assert len(wings) == 2
    # unaffected component rows pass through with IDENTICAL labels
    prev_m = _asgn(prev)
    untouched = {
        u: c for u, c in prev_m.items() if u.startswith("https://site0000")
    }
    assert untouched and all(_asgn(got)[u] == c for u, c in untouched.items())
    # store shrank by exactly the deleted doc
    assert store.read(spark).count() == docs.count() - 1


def test_delete_min_label_member_relabels(spark, tmp_path):
    cb = CorpusBuilder(seed=78)
    cluster_urls = cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=30, inter_d=300,
        doclen=500,
    )
    docs = cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store")

    # delete the minimum member (the component LABEL) of cluster 0
    label = min(cluster_urls[0])
    assert _asgn(prev)[label] == label
    dels = spark.createDataFrame([(label,)], "id string")
    got = api.search_delete(dels, store, prev, TOL, CFG, keep_isolated=False)
    remaining = docs.where(F.col("url") != label)
    want = _asgn(_cc_of(remaining))
    assert _asgn(got) == want
    # surviving members relabeled to the new minimum
    new_label = min(u for u in cluster_urls[0] if u != label)
    assert all(want[u] == new_label for u in cluster_urls[0] if u != label)


def test_delete_whole_cluster_and_unknown_id(spark, tmp_path):
    cb = CorpusBuilder(seed=79)
    cluster_urls = cb.make_clusters(
        num_clusters=2, first_size=3, size_step=2, intra_d=30, inter_d=300,
        doclen=400,
    )
    docs = cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store")

    doomed = list(cluster_urls[0]) + ["https://nowhere.example/ghost"]
    dels = spark.createDataFrame([(u,) for u in doomed], "id string")
    got = api.search_delete(dels, store, prev, TOL, CFG, keep_isolated=False)
    remaining = docs.where(~F.col("url").isin(*cluster_urls[0]))
    assert _asgn(got) == _asgn(_cc_of(remaining))
    assert not any(u in _asgn(got) for u in doomed)
    assert store.read(spark).count() == docs.count() - len(cluster_urls[0])


def test_keep_isolated_emits_singleton_rows(spark, tmp_path):
    docs = _bridge_corpus(spark)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store")
    # delete both wings' partners: a2, c2, AND the bridge — a and c end up
    # edge-less survivors of an affected component
    doomed = [
        "https://bridge.example/a2",
        "https://bridge.example/b",
        "https://bridge.example/c2",
    ]
    dels = spark.createDataFrame([(u,) for u in doomed], "id string")
    got = _asgn(
        api.search_delete(dels, store, prev, TOL, CFG, keep_isolated=True)
    )
    assert got["https://bridge.example/a"] == "https://bridge.example/a"
    assert got["https://bridge.example/c"] == "https://bridge.example/c"
    # with keep_isolated=False they vanish, matching from-scratch CC
    store2 = _store_of(spark, docs, tmp_path / "store2")
    got2 = _asgn(
        api.search_delete(dels, store2, prev, TOL, CFG, keep_isolated=False)
    )
    assert "https://bridge.example/a" not in got2
    remaining = docs.where(~F.col("url").isin(*doomed))
    assert got2 == _asgn(_cc_of(remaining))


@pytest.mark.parametrize("seed", [101, 102])
def test_randomized_delete_parity(spark, tmp_path, seed):
    import numpy as np

    cb = CorpusBuilder(seed=seed)
    cb.make_clusters(
        num_clusters=3, first_size=3, size_step=1, intra_d=30, inter_d=300,
        doclen=400,
    )
    cb.add_singletons(2, 200, 300, site=9)
    docs = cb.to_spark(spark, partitions=4).localCheckpoint(eager=True)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / f"store{seed}", buckets=4)

    urls = sorted(r["url"] for r in docs.select("url").collect())
    rng = np.random.default_rng(seed)
    doomed = [u for u in urls if rng.random() < 0.3]
    dels = spark.createDataFrame([(u,) for u in doomed], "id string")
    got = api.search_delete(dels, store, prev, TOL, CFG, keep_isolated=False)
    remaining = docs.where(~F.col("url").isin(*doomed))
    assert _asgn(got) == _asgn(_cc_of(remaining))
    assert store.read(spark).count() == len(urls) - len(doomed)


def test_delete_components_pure_algebra(spark):
    """Unit: synthetic graph 1-2-3 (bridge 2) plus component {10,11} plus a
    carried singleton row (20,20)."""
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "id long, component long",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    dels = spark.createDataFrame([(2,)], "id long")
    got = _asgn(delete_components(prev, dels, edges, keep_isolated=True))
    # 1 and 3 split into isolated singletons; {10,11} and (20,20) untouched
    assert got == {1: 1, 3: 3, 10: 10, 11: 10, 20: 20}
    got2 = _asgn(delete_components(prev, dels, edges, keep_isolated=False))
    assert got2 == {10: 10, 11: 10, 20: 20}
    # deleting a carried singleton removes its row
    got3 = _asgn(
        delete_components(
            prev, spark.createDataFrame([(20,)], "id long"), edges
        )
    )
    assert got3 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_read_for_ids_bucket_pruned(spark, tmp_path):
    cb = CorpusBuilder(seed=80)
    cb.add_singletons(12, 200, 300, site=1)
    docs = cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store", buckets=4)
    urls = sorted(r["url"] for r in docs.select("url").collect())
    want = set(urls[:3])
    ids = spark.createDataFrame([(u,) for u in want], "id string")
    got = store.read_for_ids(ids)
    assert {r["id"] for r in got.select("id").collect()} == want
    # empty request short-circuits
    empty = spark.createDataFrame([], "id string")
    assert store.read_for_ids(empty).count() == 0


def test_job_cli_incremental_delete(spark, tmp_path):
    """--incremental-delete removes ids from an existing checkpoint's
    clustering and writes the updated assignment; equals a full job over
    the remaining corpus; read-only on the store unless
    --incremental-commit."""
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=97)
    cluster_urls = cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=25, inter_d=300,
        doclen=600,
    )
    all_docs = cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)
    # delete the minimum (label) member of cluster 0: relabels, no
    # isolated survivors (3 members remain a cluster)
    doomed = min(cluster_urls[0])
    remaining = all_docs.where(F.col("url") != doomed)

    all_path = str(tmp_path / "all_docs")
    dels_path = str(tmp_path / "dels")
    rem_path = str(tmp_path / "rem_docs")
    all_docs.write.parquet(all_path)
    spark.createDataFrame([(doomed,)], "id string").write.parquet(dels_path)
    remaining.write.parquet(rem_path)

    ckpt = str(tmp_path / "ckpt")
    assert job.main([
        "--docs", all_path, "--checkpoint", ckpt, "--tolerance", "0.100",
    ]) == 0
    store_manifest = tmp_path / "ckpt" / "signatures" / "_manifest.json"
    before = store_manifest.read_text()

    del_out = str(tmp_path / "del_groups")
    assert job.main([
        "--incremental-delete", dels_path, "--checkpoint", ckpt,
        "--tolerance", "0.100", "--output", del_out,
    ]) == 0
    assert store_manifest.read_text() == before  # read-only fold

    full_ckpt = str(tmp_path / "ckpt_full")
    full_out = str(tmp_path / "full_groups")
    assert job.main([
        "--docs", rem_path, "--checkpoint", full_ckpt,
        "--tolerance", "0.100", "--output", full_out,
    ]) == 0
    got = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(del_out).collect()
    }
    want = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(full_out).collect()
    }
    assert got == want and len(got) == 8

    # committing shrinks the store by the deleted doc
    assert job.main([
        "--incremental-delete", dels_path, "--checkpoint", ckpt,
        "--tolerance", "0.100", "--output", del_out, "--incremental-commit",
    ]) == 0
    assert store_manifest.read_text() != before
    from vid_dup_finder_lib_spark.config import DEFAULT_CONFIG
    from vid_dup_finder_lib_spark.plans.job import _flag_extras, build_parser
    # read() validates the store fingerprint, which carries the CLI's
    # flag-derived extras — inspect with the same default flags the runs used
    committed = PartitionedSignatureStore(
        str(tmp_path / "ckpt" / "signatures"), DEFAULT_CONFIG,
        extra_fingerprint=_flag_extras(build_parser().parse_args(
            ["--checkpoint", ckpt]
        )),
    )
    assert committed.read(spark).where(F.col("id") == doomed).count() == 0
    assert committed.read(spark).count() == 8


def test_read_for_ids_plan_prunes_buckets(spark, tmp_path):
    """The PLANS.md claim behind O(affected) deletion: read_for_ids must
    touch ONLY the partition directories the requested ids hash into —
    asserted at the file level via inputFiles(), not just by row content."""
    from vid_dup_finder_lib_spark.plans.sigstore import bucket_col

    cb = CorpusBuilder(seed=81)
    cb.add_singletons(24, 200, 300, site=2)
    docs = cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store", buckets=8)

    urls = sorted(r["url"] for r in docs.select("url").collect())
    want = urls[:2]
    ids = spark.createDataFrame([(u,) for u in want], "id string")
    target_buckets = {
        r["b"]
        for r in ids.select(bucket_col("id", 8).alias("b")).collect()
    }
    pruned = store.read_for_ids(ids)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), f"no partition filter in plan:\n{plan}"
    # the IN-list in the partition filter is exactly the target buckets —
    # planning-time pruning, every other directory never touched
    in_m = re.search(r"bucket#\d+L? IN \(([^)]*)\)", m.group(1))
    assert in_m, f"partition filter is not an IN prune: {m.group(1)}"
    planned = {int(x) for x in in_m.group(1).replace(" ", "").split(",")}
    assert planned == target_buckets
    # and the pruned read still returns exactly the requested rows
    assert {r["id"] for r in pruned.select("id").collect()} == set(want)


def test_delete_then_time_travel_restores(spark, tmp_path):
    """A takedown applied in error must be recoverable: delete retains a
    snapshot generation, so read_as_of(1) still sees the removed rows and
    restore_previous() undoes the shrink."""
    cb = CorpusBuilder(seed=82)
    cb.add_singletons(6, 200, 300, site=3)
    docs = cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store", buckets=4)
    urls = sorted(r["url"] for r in docs.select("url").collect())
    dels = spark.createDataFrame([(urls[0],)], "id string")
    store.delete(dels)
    assert store.read(spark).count() == 5
    assert store.read_as_of(spark, 1).count() == 6
    store.restore_previous(spark)
    assert store.read(spark).count() == 6
    assert {r["id"] for r in store.read(spark).select("id").collect()} == set(urls)


def test_delete_empty_set_is_noop(spark, tmp_path):
    """An empty takedown batch: assignment passes through unchanged, store
    untouched."""
    cb = CorpusBuilder(seed=83)
    cb.make_clusters(
        num_clusters=1, first_size=3, size_step=0, intra_d=20, inter_d=200,
        doclen=400,
    )
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    store = _store_of(spark, docs, tmp_path / "store", buckets=4)
    manifest_before = (tmp_path / "store" / "_manifest.json").read_text()
    empty = spark.createDataFrame([], "id string")
    got = api.search_delete(empty, store, prev, TOL, CFG)
    assert _asgn(got) == _asgn(prev)
    assert (tmp_path / "store" / "_manifest.json").read_text() == manifest_before


def test_delete_refuses_survivor_only_store(spark, tmp_path):
    """A store missing a surviving member's signature would silently drop
    its edges: search_delete must refuse, not return a wrong clustering."""
    cb = CorpusBuilder(seed=84)
    cluster_urls = cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=20, inter_d=200,
        doclen=400,
    )
    docs = cb.to_spark(spark, partitions=1).localCheckpoint(eager=True)
    prev = _cc_of(docs).localCheckpoint(eager=True)
    # store holds only the first member: the others are unassignable
    store = _store_of(
        spark,
        docs.where(F.col("url") == min(cluster_urls[0])),
        tmp_path / "store",
        buckets=4,
    )
    dels = spark.createDataFrame([(max(cluster_urls[0]),)], "id string")
    with pytest.raises(ValueError, match="missing"):
        api.search_delete(dels, store, prev, TOL, CFG, update_store=False)


def test_threshold_sweep_empty_thresholds_raise(spark):
    from vid_dup_finder_lib_spark.operators.components import (
        threshold_sweep_components,
    )

    edges = spark.createDataFrame(
        [(1, 2, 1, 1)], "id1 long, id2 long, inter_count long, union_count long"
    )
    with pytest.raises(ValueError, match="threshold"):
        threshold_sweep_components(edges, [])
