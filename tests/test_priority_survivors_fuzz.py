"""Differential fuzz of priority_survivors against a per-row reference.

Random cluster structures with adversarial score distributions — ties,
negatives, nulls (including all-null clusters, the silent-drop bug class
the sentinel ordering fixed), singletons, and docs absent from any
cluster — must match a brute-force Python implementation of the
documented rule exactly: per cluster keep the max-score member (nulls
rank below everything; ties -> min id), singletons keep themselves.
"""

import numpy as np

from vid_dup_finder_lib_spark.operators.dedup import priority_survivors


def _ref(docs: dict[int, int | None], clusters: dict[int, list[int]]):
    out = {}
    clustered = set()
    for c, members in clusters.items():
        clustered.update(members)
        # max by (non-null beats null, then score, then MIN id via -m)
        win = max(
            members,
            key=lambda m: (
                docs[m] is not None,
                docs[m] if docs[m] is not None else 0,
                -m,
            ),
        )
        out[win] = (len(members), docs[win])
    for d, s in docs.items():
        if d not in clustered:
            out[d] = (1, s)
    return out


def test_fuzz_matches_reference(spark):
    rng = np.random.RandomState(5)
    for trial in range(6):
        n = int(rng.randint(8, 40))
        docs = {}
        for d in range(n):
            r = rng.randint(0, 5)
            if r == 0:
                docs[d] = None
            elif r == 1:
                docs[d] = -int(rng.randint(0, 50))
            else:
                docs[d] = int(rng.randint(0, 8))  # small range -> many ties
        ids = list(docs)
        rng.shuffle(ids)
        clusters: dict[int, list[int]] = {}
        i = 0
        cid = 100
        while i < len(ids) - 1:
            size = int(rng.randint(2, 5))
            members = ids[i : i + size]
            if len(members) < 2:
                break
            clusters[cid] = members
            cid += 1
            i += size
            if rng.rand() < 0.3:  # leave a gap: unclustered docs
                i += 1

        docs_df = spark.createDataFrame(
            [(d, s) for d, s in docs.items()], "doc_id long, quality long"
        )
        cc_df = spark.createDataFrame(
            [(m, c) for c, ms in clusters.items() for m in ms],
            "doc_id long, cluster_id long",
        )
        got = {
            r["doc_id"]: (r["cluster_size"], r["score"])
            for r in priority_survivors(
                docs_df.repartition(3), cc_df.repartition(2), score_col="quality"
            ).collect()
        }
        want = _ref(docs, clusters)
        assert got == want, f"trial {trial}: {got} != {want}"
