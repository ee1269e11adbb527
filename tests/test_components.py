"""Connected components vs a pure-Python union-find oracle (the reference's
DisjointSet tests, disjoint_set.rs:217-335, re-expressed for the distributed
implementation)."""

import numpy as np


def _uf_oracle(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), set()).add(i)
    return {frozenset(s) for s in comp.values() if len(s) > 1}


def _cc_spark(spark, edges):
    from vid_dup_finder_lib_spark.operators.components import connected_components

    df = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "id1 long, id2 long")
    rows = connected_components(df).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r.component, set()).add(r.id)
    return {frozenset(s) for s in comp.values()}


def test_random_graphs(spark):
    rng = np.random.default_rng(21)
    for trial in range(3):
        n = 200
        m = int(rng.integers(50, 300))
        edges = [tuple(sorted(rng.choice(n, 2, replace=False))) for _ in range(m)]
        assert _cc_spark(spark, edges) == _uf_oracle(n, edges)


def test_long_chain(spark):
    """Worst-case diameter: a 40-node path (checks iteration count and
    convergence detection, not just dense-cluster happy path)."""
    edges = [(i, i + 1) for i in range(39)]
    got = _cc_spark(spark, edges)
    assert got == {frozenset(range(40))}


def test_large_mixed_graph(spark):
    """2k nodes: several long chains (the large-star/small-star stress
    shape) + dense blobs + random edges, vs the union-find oracle."""
    rng = np.random.default_rng(33)
    edges = []
    for c in range(4):  # four 150-node chains
        base = c * 150
        edges += [(base + i, base + i + 1) for i in range(149)]
    for b in range(3):  # three 30-node dense blobs
        base = 700 + b * 30
        edges += [(base + i, base + j) for i in range(30) for j in range(i + 1, 30, 7)]
    edges += [
        tuple(sorted(rng.choice(np.arange(800, 2000), 2, replace=False)))
        for _ in range(400)
    ]
    edges = [(int(a), int(b)) for a, b in edges if a != b]
    assert _cc_spark(spark, edges) == _uf_oracle(2000, edges)


def test_path_graph_logarithmic_rounds(spark):
    """A 1000-node chain — the shape that breaks min-label propagation
    (needs O(diameter)=1000 rounds there; large-star/small-star must finish
    within the default 50-round cap, i.e. O(log n)).  VERDICT r1 item 3.
    rows_per_partition=1 pins the ITERATIVE path (the r6 small-graph
    dispatch would otherwise solve this in one union-find task)."""
    from vid_dup_finder_lib_spark.operators.components import connected_components

    edges = [(i, i + 1) for i in range(999)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    rows = connected_components(df, rows_per_partition=1).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r.component, set()).add(r.id)
    assert {frozenset(s) for s in comp.values()} == {frozenset(range(1000))}


def test_nonconvergence_raises(spark):
    """Hitting the iteration cap raises instead of returning a silently wrong
    partial labeling (ADVICE r1, components.py).  rows_per_partition=1 pins
    the iterative path — the single-task union-find dispatch never needs
    rounds and cannot hit the cap."""
    import pytest

    from vid_dup_finder_lib_spark.operators.components import (
        ConvergenceError,
        connected_components,
    )

    edges = [(i, i + 1) for i in range(999)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    with pytest.raises(ConvergenceError):
        connected_components(df, max_iterations=1, rows_per_partition=1).collect()


def test_small_graph_dispatch_equivalence(spark):
    """r6 optimization: the single-task union-find path (edge count <=
    rows_per_partition) must produce EXACTLY the iterative star-contraction
    path's assignment — same (id, component) rows, component = min member
    id — on random graphs, chains and duplicate/reversed edge lists."""
    import numpy as np

    from vid_dup_finder_lib_spark.operators.components import connected_components

    rng = np.random.default_rng(7)
    cases = []
    for _ in range(3):
        n = 120
        m = int(rng.integers(40, 260))
        cases.append(
            [tuple(int(x) for x in rng.choice(n, 2, replace=False)) for _ in range(m)]
        )
    cases.append([(i, i + 1) for i in range(60)])  # chain
    cases.append([(1, 2), (2, 1), (1, 2), (3, 3), (4, 5)])  # dups/reversed/self
    for edges in cases:
        df = spark.createDataFrame(edges, "id1 long, id2 long")
        fast = {(r.id, r.component) for r in connected_components(df).collect()}
        slow = {
            (r.id, r.component)
            for r in connected_components(df, rows_per_partition=1).collect()
        }
        assert fast == slow and fast


def test_small_graph_dispatch_string_ids(spark):
    """String ids (urls) through the union-find path: min label must follow
    Spark's UTF8 byte ordering — which Python string comparison matches for
    valid UTF-8 (code-point order == byte order)."""
    from vid_dup_finder_lib_spark.operators.components import connected_components

    edges = [
        ("https://b/x", "https://a/y"),
        ("https://a/y", "https://c/z"),
        ("z1", "z2"),
    ]
    df = spark.createDataFrame(edges, "id1 string, id2 string")
    fast = {(r.id, r.component) for r in connected_components(df).collect()}
    slow = {
        (r.id, r.component)
        for r in connected_components(df, rows_per_partition=1).collect()
    }
    assert fast == slow
    assert ("https://c/z", "https://a/y") in fast


def test_merge_cases(spark):
    """The three DisjointSet::insert cases (disjoint_set.rs:22-44): new set,
    append to set, merge two sets."""
    edges = [(1, 2), (3, 4), (2, 3), (10, 11)]
    got = _cc_spark(spark, edges)
    assert got == {frozenset({1, 2, 3, 4}), frozenset({10, 11})}


# ---------------------------------------------------------------------------
# incremental_components
# ---------------------------------------------------------------------------


def _cc_map(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_incremental_equals_from_scratch_random(spark):
    """CC(star(G1) ∪ G2) == CC(G1 ∪ G2) on random graphs, any split."""
    import random

    from vid_dup_finder_lib_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(54)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(10, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        cut = rng.randint(0, len(edges))
        old = spark.createDataFrame(edges[:cut] or [(0, 1)], "id1 long, id2 long")
        new = spark.createDataFrame(edges[cut:] or [(2, 3)], "id1 long, id2 long")
        full = old.unionByName(new)
        prev = connected_components(old)
        got = _cc_map(incremental_components(prev, new))
        want = _cc_map(connected_components(full))
        assert got == want, f"trial {trial}"


def test_incremental_label_stability_and_bridge(spark):
    from vid_dup_finder_lib_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    old = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 21)], "id1 long, id2 long"
    )
    prev = connected_components(old)
    # no bridge: untouched old component keeps its label
    new = spark.createDataFrame([(100, 101)], "id1 long, id2 long")
    got = _cc_map(incremental_components(prev, new))
    assert got[1] == got[5] == got[9] == 1
    assert got[20] == got[21] == 20
    assert got[100] == got[101] == 100
    # bridge: new edge joins the two old components -> min label wins
    bridge = spark.createDataFrame([(9, 21)], "id1 long, id2 long")
    got2 = _cc_map(incremental_components(prev, bridge))
    assert got2[1] == got2[5] == got2[9] == got2[20] == got2[21] == 1


def test_incremental_singleton_carry_through(spark):
    from vid_dup_finder_lib_spark.operators.components import (
        incremental_components,
    )

    prev = spark.createDataFrame(
        [(7, 7), (1, 1), (3, 1)], "id long, component long"
    )
    # 7 is a singleton: no new edge -> retained as its own component
    new = spark.createDataFrame([(50, 51)], "id1 long, id2 long")
    got = _cc_map(incremental_components(prev, new))
    assert got[7] == 7 and got[1] == 1 and got[3] == 1 and got[50] == 50
    # a new edge pulls the singleton into a real component
    pull = spark.createDataFrame([(7, 2)], "id1 long, id2 long")
    got2 = _cc_map(incremental_components(prev, pull))
    assert got2[7] == 2 and got2[2] == 2


def test_threshold_sweep_refinement(spark):
    """Tighter thresholds refine looser clusterings: every tight cluster
    sits wholly inside one loose cluster; edge filtering is exact."""
    from vid_dup_finder_lib_spark.operators.components import (
        threshold_sweep_components,
    )

    # chain 1-2-3-4 with decreasing similarity along the chain, plus an
    # isolated pair {10,11} at full strength
    edges = spark.createDataFrame(
        [
            (1, 2, 9, 10),   # 0.9
            (2, 3, 3, 5),    # 0.6
            (3, 4, 2, 5),    # 0.4
            (10, 11, 1, 1),  # 1.0
        ],
        "id1 long, id2 long, inter_count long, union_count long",
    )
    out = threshold_sweep_components(edges, [(2, 5), (1, 2), (2, 3)])
    got = {
        (r["thr_num"], r["thr_den"], r["id"]): r["component"]
        for r in out.collect()
    }
    # 2/5 keeps all edges: {1,2,3,4} + {10,11}
    assert [got[(2, 5, i)] for i in (1, 2, 3, 4)] == [1, 1, 1, 1]
    # 1/2 drops the 0.4 edge: {1,2,3}, 4 vanishes (nodes-only-if-edged)
    assert [got[(1, 2, i)] for i in (1, 2, 3)] == [1, 1, 1]
    assert (1, 2, 4) not in got
    # 2/3 keeps only 0.9 and 1.0: {1,2}
    assert [got[(2, 3, i)] for i in (1, 2)] == [1, 1]
    assert (2, 3, 3) not in got
    for num, den in [(2, 5), (1, 2), (2, 3)]:
        assert got[(num, den, 10)] == 10 and got[(num, den, 11)] == 10

    # refinement property: members of one tight cluster share one loose one
    tight = {}
    for (n, d, i), c in got.items():
        if (n, d) == (2, 3):
            tight.setdefault(c, []).append(i)
    for members in tight.values():
        assert len({got[(2, 5, m)] for m in members}) == 1


def test_delete_components_randomized_vs_naive_union_find(spark):
    """Pure-algebra property check over random graphs and delete sets: the
    fold must equal naive union-find over the surviving subgraph, with
    unaffected components' rows passing through label-stable."""
    import numpy as np

    from vid_dup_finder_lib_spark.operators.components import (
        connected_components,
        delete_components,
    )

    def naive_cc(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in nodes}

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(8, 40))
        m = int(rng.integers(4, 60))
        edges = {
            tuple(sorted((int(a), int(b))))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        }
        nodes = sorted({x for e in edges for x in e})
        full = naive_cc(edges, nodes)
        prev = spark.createDataFrame(
            [(k, v) for k, v in full.items()], "id long, component long"
        )
        dels = sorted({int(x) for x in rng.choice(nodes, size=max(1, len(nodes) // 4))})
        edges_df = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "id1 long, id2 long"
        )
        got = {
            r["id"]: r["component"]
            for r in delete_components(
                prev,
                spark.createDataFrame([(d,) for d in dels], "id long"),
                edges_df,
                keep_isolated=False,
            ).collect()
        }
        kept_edges = {
            (a, b) for a, b in edges if a not in dels and b not in dels
        }
        kept_nodes = sorted({x for e in kept_edges for x in e})
        want = naive_cc(kept_edges, kept_nodes)
        assert got == want, f"trial {trial}: {got} != {want}"
