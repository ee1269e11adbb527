"""Fuzz the matchset decomposition: per-component greedy == global greedy.

``matchset_groups`` replays the reference's greedy consume
(search_algorithm.rs:81-171) INSIDE each connected component
(applyInPandas task per component).  That decomposition is sound only
because the greedy walk can never consume across components — this fuzz
pins it by comparing the distributed output against an independent
GLOBAL replay over the whole edge list on random graphs with heavy
length ties (the (doclen, id) tie-break is load-bearing).

The reference semantics replayed here, straight from the survey's
reading of the Rust: entries sorted by (duration, path); every seed is
marked matched before scanning even if it matches nothing; members match
against the SEED only; groups of >= 2 are emitted with the seed's id as
the group id.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.grouping import matchset_groups

edges_strategy = st.lists(
    st.tuples(st.integers(0, 17), st.integers(0, 17)),
    min_size=1,
    max_size=40,
).filter(lambda es: any(a != b for a, b in es))


def _global_greedy(edge_list, lens):
    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    order = sorted(adj, key=lambda i: (lens[i], i))
    matched = set()
    out = {}
    for seed in order:
        if seed in matched:
            continue
        matched.add(seed)
        members = sorted(
            (m for m in adj[seed] if m not in matched),
            key=lambda i: (lens[i], i),
        )
        if members:
            matched.update(members)
            out.update({m: (seed, m == seed) for m in [seed, *members]})
    return out  # id -> (cluster_id, is_seed)


@settings(max_examples=15, deadline=None)
@given(raw_edges=edges_strategy, len_mod=st.integers(1, 4))
def test_matchset_equals_global_greedy(spark, raw_edges, len_mod):
    # string ids whose lexicographic order matches numeric order; lens with
    # heavy ties (len_mod=1 makes EVERY length equal -> pure id tie-break)
    ids = {n: f"u{n:03d}" for n in range(18)}
    lens = {ids[n]: 100 + (n % len_mod) for n in range(18)}
    edge_list = sorted({(ids[min(a, b)], ids[max(a, b)]) for a, b in raw_edges if a != b})
    want = _global_greedy(edge_list, lens)

    df = spark.createDataFrame(
        [(a, b, lens[a], lens[b]) for a, b in edge_list],
        "id1: string, id2: string, len1: long, len2: long",
    )
    got = {
        r.id: (r.cluster_id, r.is_seed)
        for r in matchset_groups(df).collect()
    }
    assert got == want


def test_matchset_guard_raises_on_mega_component(spark):
    # a star with more edges than the cap must refuse, never silently group
    edge_list = [("u000", f"u{i:03d}") for i in range(1, 30)]
    df = spark.createDataFrame(
        [(a, b, 100, 100) for a, b in edge_list],
        "id1: string, id2: string, len1: long, len2: long",
    )
    try:
        matchset_groups(df, max_component_edges=10)
    except ValueError as e:
        assert "max_component_edges" in str(e)
    else:
        raise AssertionError("mega-component did not raise")
