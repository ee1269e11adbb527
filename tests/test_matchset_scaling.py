"""Parity gate for the sorted-adjacency greedy matchset replay.

The round-3 `_greedy_matchset` replaces the quadratic order-suffix scan with
a sorted-adjacency scan.  This file pins exact output parity against a
verbatim replica of the quadratic round-2 implementation on a planted
10^4-member component (hubs + random tree + random extra edges — many ties,
empty seeds, alternating hub consumption), plus a speed sanity bound.
"""

import random
import time

import pandas as pd

from vid_dup_finder_lib_spark.operators.grouping import _greedy_matchset


def _greedy_reference_quadratic(pdf: pd.DataFrame) -> pd.DataFrame:
    """Verbatim round-2 implementation (order-suffix scan per seed)."""
    lens, adj = {}, {}
    for r in pdf.itertuples(index=False):
        lens[r.id1] = int(r.len1)
        lens[r.id2] = int(r.len2)
        adj.setdefault(r.id1, set()).add(r.id2)
        adj.setdefault(r.id2, set()).add(r.id1)
    order = sorted(lens, key=lambda i: (lens[i], i))
    matched = set()
    out_cluster, out_id, out_seed = [], [], []
    for pos, seed in enumerate(order):
        if seed in matched:
            continue
        matched.add(seed)
        members = [
            m for m in order[pos + 1 :] if m not in matched and m in adj.get(seed, ())
        ]
        if members:
            matched.update(members)
            for m in [seed, *members]:
                out_cluster.append(seed)
                out_id.append(m)
                out_seed.append(m == seed)
    return pd.DataFrame({"cluster_id": out_cluster, "id": out_id, "is_seed": out_seed})


def _planted_component(n: int, seed: int = 5) -> pd.DataFrame:
    """One connected component of n members: 100 hubs with fan-out, a random
    spanning tree over everything, random extra edges, heavily tied lens."""
    rng = random.Random(seed)
    lens = {i: rng.randrange(1, 50) for i in range(n)}  # many ties
    edges = set()
    for m in range(100, n):
        edges.add((m % 100, m))                      # hub fan-out
    for i in range(1, n):
        edges.add((rng.randrange(i), i))             # random spanning tree
    for _ in range(2 * n):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows = [(f"d{a:06d}", f"d{b:06d}", lens[a], lens[b]) for a, b in sorted(edges)]
    return pd.DataFrame(rows, columns=["id1", "id2", "len1", "len2"])


def _canon(df: pd.DataFrame):
    return sorted(map(tuple, df.itertuples(index=False)))


def test_parity_on_planted_10k_component():
    pdf = _planted_component(10_000)
    t0 = time.time()
    fast = _greedy_matchset(pdf)
    fast_secs = time.time() - t0
    ref = _greedy_reference_quadratic(pdf)
    assert _canon(fast) == _canon(ref)
    assert len(fast) > 0
    # speed sanity: the sorted-adjacency pass on 10^4 nodes / ~4*10^4 edges
    # is sub-second even on a noisy host
    assert fast_secs < 5.0, f"greedy replay took {fast_secs:.1f}s on 10^4 nodes"


def test_parity_on_small_random_graphs():
    for seed in range(10):
        pdf = _planted_component(300, seed=seed)
        assert _canon(_greedy_matchset(pdf)) == _canon(
            _greedy_reference_quadratic(pdf)
        ), f"divergence at seed {seed}"
