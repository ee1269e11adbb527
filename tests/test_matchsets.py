"""The reference's matchset integration tests re-expressed over text
(``vid_dup_finder_lib/tests/test_find_all.rs``, per BASELINE.json).

Distances are planted token substitutions out of a 1000-token body, so
tolerance maps as radius = floor(tol*1000) exactly like the reference's
TOLERANCE_SCALING_FACTOR.  Cluster generators guarantee intra*2 < inter, the
regime where greedy matchsets == connected components (test_find_all.rs:77-84).

LSH config: 128 bands x 1 row — at the widest test tolerance (0.200, i.e.
J >= 0.25 between seed and member) candidate recall is 1-(1-J)^128 ≈ 1-1e-16,
so the banded search is exhaustive with certainty at these scales.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder

PARITY_CFG = SigConfig(num_perms=128, lsh_bands=128, seed=42)


def _group_sizes(groups_df):
    rows = groups_df.collect()
    return sorted(Counter(r.cluster_id for r in rows).values())


# test_find_all.rs:134-169
def test_find_dups_finds_a_known_group(spark):
    cb = CorpusBuilder(seed=11)
    cb.make_clusters(
        num_clusters=1, first_size=50, size_step=0, intra_d=100, inter_d=0, doclen=1000
    )
    docs = cb.to_spark(spark).localCheckpoint()
    # tol = (2 * intra) / 1000, as the reference computes it
    groups = api.search(docs, tolerance=0.200, cfg=PARITY_CFG, grouping="matchset")
    assert _group_sizes(groups) == [50]


# test_find_all.rs:171-238 — duration 50 vs 250 s -> 5x length bands
def test_find_dups_discriminates_by_length(spark):
    cb = CorpusBuilder(seed=12)
    base_short = cb.base_tokens(1000)
    cb.add_cluster(0, base_short, size=100, intra_d=100, site=0)
    base_long = cb.base_tokens(5000)
    cb.add_cluster(1, base_long, size=50, intra_d=100, site=1)
    docs = cb.to_spark(spark).localCheckpoint()
    groups = api.search(docs, tolerance=0.200, cfg=PARITY_CFG, grouping="matchset")
    assert _group_sizes(groups) == [50, 100]


# test_find_all.rs:240-269
def test_find_dups_discriminates_by_distance(spark):
    cb = CorpusBuilder(seed=13)
    cb.make_clusters(
        num_clusters=2, first_size=100, size_step=10, intra_d=50, inter_d=150, doclen=1000
    )
    docs = cb.to_spark(spark).localCheckpoint()
    groups = api.search(docs, tolerance=0.100, cfg=PARITY_CFG, grouping="matchset")
    assert _group_sizes(groups) == [100, 110]


# test_find_all.rs:271-315
def test_find_with_refs(spark):
    cb = CorpusBuilder(seed=14)
    # keep the cluster *bases* as the reference keeps its start hashes
    bases = []
    base = cb.base_tokens(1000)
    for c in range(5):
        bases.append(base)
        cb.add_cluster(c, base, size=100 + 10 * c, intra_d=50, site=c)
        base = cb.base_at_distance(base, 150)
    docs = cb.to_spark(spark).localCheckpoint()

    def ref_docs(idxs):
        rb = CorpusBuilder(seed=99)
        for i in idxs:
            rb.add_doc(f"https://refs.example/{i}", bases[i])
        return rb.to_spark(spark, partitions=1)

    # one ref = cluster 3's start -> exactly its 130 members matched
    got = api.search_with_references(
        ref_docs([3]), docs, tolerance=0.050, cfg=PARITY_CFG
    ).collect()
    assert len(got) == 130
    assert all(r.cand_id.startswith("https://site00003") for r in got)

    # two refs = clusters 0 and 4 -> groups of 100 and 140
    got2 = api.search_with_references(
        ref_docs([0, 4]), docs, tolerance=0.050, cfg=PARITY_CFG
    ).collect()
    per_ref = Counter(r.ref_id for r in got2)
    assert sorted(per_ref.values()) == [100, 140]


# search_algorithm.rs:200-209
def test_empty_input(spark):
    cb = CorpusBuilder(seed=15)
    cb.add_doc("https://x.example/1", cb.base_tokens(100))
    docs = cb.to_spark(spark, partitions=1).limit(0)
    assert api.search(docs, tolerance=0.2, cfg=PARITY_CFG).count() == 0


# FIXTURES.md fx_singletons + J9 unique output
def test_singletons_all_unique(spark):
    from vid_dup_finder_lib_spark.operators.matchdb import unique_docs

    cb = CorpusBuilder(seed=16)
    cb.add_singletons(60, 500, 1500)
    docs = cb.to_spark(spark).localCheckpoint()
    edges = api.find_edges(docs, tolerance=0.100, cfg=PARITY_CFG)
    assert edges.count() == 0
    assert unique_docs(docs, edges).count() == 60


# FIXTURES.md fx_exact_dups — examples/example.rs:69-71 two-groups-of-N smoke
def test_exact_dups_and_content_hash(spark):
    from vid_dup_finder_lib_spark.operators.dedup import exact_dup_groups
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures

    cb = CorpusBuilder(seed=17)
    cb.make_clusters(
        num_clusters=2, first_size=3, size_step=0, intra_d=0, inter_d=400, doclen=600
    )
    cb.add_singletons(5, 400, 800)
    docs = cb.to_spark(spark).localCheckpoint()

    groups = api.search(docs, tolerance=0.010, cfg=PARITY_CFG, grouping="matchset")
    assert _group_sizes(groups) == [3, 3]

    sigs = build_signatures(docs, PARITY_CFG)
    eg = exact_dup_groups(sigs).collect()
    assert sorted(r.group_size for r in eg) == [3, 3]


def test_greedy_consume_parity(spark):
    """A chain regime where greedy matchsets differ from CC: a-b-c at
    distances a~b=80, b~c=80, a~c=160 with tol radius 100.  CC merges all
    three; the reference's greedy pass seeds at the sort-first member and
    consumes only its in-tolerance neighbors.
    """
    cb = CorpusBuilder(seed=18)
    base = cb.base_tokens(1000)
    b_toks = cb.member_at_distance(base, 80)
    c_toks = cb.member_at_distance(b_toks, 80)
    cb.add_doc("https://chain.example/a", base)
    cb.add_doc("https://chain.example/b", b_toks)
    cb.add_doc("https://chain.example/c", c_toks)
    docs = cb.to_spark(spark, partitions=1).localCheckpoint()

    cc = api.search(docs, tolerance=0.100, cfg=PARITY_CFG, grouping="cc")
    assert _group_sizes(cc) == [3]

    ms = api.search(docs, tolerance=0.100, cfg=PARITY_CFG, grouping="matchset").collect()
    by_cluster = {}
    for r in ms:
        by_cluster.setdefault(r.cluster_id, set()).add(r.id)
    # seed = 'a' (sort order); its group = {a, b}; c stays out: its only
    # in-tolerance neighbor b is already consumed, and a consumed seed can't
    # re-seed (search_algorithm.rs:132-170)
    assert by_cluster == {
        "https://chain.example/a": {
            "https://chain.example/a",
            "https://chain.example/b",
        }
    }
