"""Differential fuzz of duplicate_span_rewrite against a per-row reference.

Random tiny-alphabet corpora (3-5 distinct tokens, doc lengths 0..30) force
dense gram duplication — overlapping spans, intra-doc repeats, canonical
occurrences split across docs, whole-doc erasures — and the relational plan
must match a brute-force Python implementation of the documented semantics
exactly (canonical = min (id, pos) per duplicated gram; covered = union of
non-canonical [pos, pos+k-1]; rewrite = drop covered positions).

Batching: corpora share one Spark job per k — tokens are prefixed with the
corpus index so grams can never collide across corpora, which makes the
union run equal the per-corpus runs by construction.
"""

import numpy as np
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.substring import duplicate_span_rewrite


def _ref_rewrite(docs: dict[int, list[str]], k: int):
    occ_by_gram: dict[tuple, list[tuple[int, int]]] = {}
    for i, toks in docs.items():
        for p in range(len(toks) - k + 1):
            occ_by_gram.setdefault(tuple(toks[p : p + k]), []).append((i, p))
    covered: dict[int, set[int]] = {i: set() for i in docs}
    for lst in occ_by_gram.values():
        if len(lst) < 2:
            continue
        canon = min(lst)
        for i, p in lst:
            if (i, p) != canon:
                covered[i].update(range(p, p + k))
    out = {}
    for i, toks in docs.items():
        kept = [t for j, t in enumerate(toks) if j not in covered[i]]
        n, r = len(toks), len(covered[i])
        out[i] = (n, r, " ".join(kept), r * 1_000_000 // max(n, 1))
    return out


def test_fuzz_matches_reference(spark):
    rng = np.random.RandomState(0)
    for k in (2, 3, 5):
        corpora = []
        for c in range(12):
            alpha = [f"c{c}t{j}" for j in range(int(rng.randint(3, 6)))]
            docs = {}
            for d in range(int(rng.randint(2, 7))):
                length = int(rng.randint(0, 31))
                docs[c * 1000 + d] = [
                    alpha[int(x)] for x in rng.randint(0, len(alpha), length)
                ]
            corpora.append(docs)

        rows = [
            (i, " ".join(toks))
            for docs in corpora
            for i, toks in docs.items()
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["removed_tokens"],
                r["kept_text"],
                r["removed_ppm"],
            )
            for r in duplicate_span_rewrite(
                df.repartition(5), k=k, id_col="doc_id"
            ).collect()
        }
        want = {}
        for docs in corpora:
            want.update(_ref_rewrite(docs, k))
        assert got == want, f"divergence at k={k}"


def test_fuzz_adversarial_single_token_runs(spark):
    # degenerate boilerplate: long runs of ONE repeated token make every
    # k-gram identical — maximal intra-doc overlap pressure on the
    # interval-union sweep and the canonical rule
    rng = np.random.RandomState(7)
    rows = []
    for d in range(8):
        parts = []
        for _ in range(int(rng.randint(1, 4))):
            parts += ["aaa"] * int(rng.randint(1, 12)) + [f"u{d}_{rng.randint(99)}"]
        rows.append((d, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (2, 4):
        got = {
            r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["kept_text"], r["removed_ppm"])
            for r in duplicate_span_rewrite(df, k=k, id_col="doc_id").collect()
        }
        want = _ref_rewrite(
            {i: (t.split(" ") if t else []) for i, t in rows}, k
        )
        assert got == want, f"divergence at k={k}"
