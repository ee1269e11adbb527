"""pair_token_lcs: exact longest common token run via diagonal islands."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.substring import pair_token_lcs


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id1 long, id2 long")


def _w(s):
    return s.split()


def test_known_lcs_and_offsets(spark):
    # shared run 'c d e f g h i j k l' (10 tokens) at offset 2 in doc1, 0 in doc2
    shared = "c d e f g h i j k l"
    docs = _toks(
        spark,
        [
            (1, _w("a b " + shared + " x y")),
            (2, _w(shared + " q r s")),
        ],
    )
    row = pair_token_lcs(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert (row["lcs_tokens"], row["start1"], row["start2"]) == (10, 2, 0)


def test_naive_dp_parity_randomized(spark):
    # random token sequences over a small alphabet, mutated copies:
    # engine result must equal a serial O(n*m) DP for every pair
    import random

    rng = random.Random(7)
    alphabet = [f"t{i}" for i in range(12)]
    docs, pairs, expect = [], [], {}

    def lcs_dp(a, b, k):
        best = (0, None, None)
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    L = cur[j]
                    s1, s2 = i - L, j - L
                    cand = (L, s1, s2)
                    if L >= k and (
                        L > best[0]
                        or (L == best[0] and (s1, s2) < (best[1], best[2]))
                    ):
                        best = cand
            prev = cur
        return best if best[0] >= k else (0, None, None)

    for n in range(8):
        a = [rng.choice(alphabet) for _ in range(60)]
        b = list(a)
        for pos in sorted(rng.sample(range(60), 4)):
            b[pos] = "zz"
        docs.append((2 * n, a))
        docs.append((2 * n + 1, b))
        pairs.append((2 * n, 2 * n + 1))
        expect[(2 * n, 2 * n + 1)] = lcs_dp(a, b, 8)

    got = {
        (r["id1"], r["id2"]): (r["lcs_tokens"], r["start1"], r["start2"])
        for r in pair_token_lcs(
            _pairs(spark, pairs), _toks(spark, docs), k=8
        ).collect()
    }
    assert got == expect


def test_short_runs_invisible_and_no_match(spark):
    docs = _toks(
        spark,
        [
            (1, _w("a b c d e f g h i j")),
            (2, _w("a b c d e f g zz zz zz")),  # common run 7 < k=8
            (3, _w("p q r s t u v w x y")),  # nothing in common
        ],
    )
    rows = {
        (r["id1"], r["id2"]): (r["lcs_tokens"], r["start1"], r["start2"])
        for r in pair_token_lcs(_pairs(spark, [(1, 2), (1, 3)]), docs, k=8).collect()
    }
    assert rows[(1, 2)] == (0, None, None)
    assert rows[(1, 3)] == (0, None, None)


def test_tie_break_smallest_start(spark):
    # two maximal 8-runs; the earliest start1 must win
    run1 = "a b c d e f g h"
    run2 = "p q r s t u v w"
    docs = _toks(
        spark,
        [
            (1, _w(run1 + " zz " + run2)),
            (2, _w(run2 + " yy " + run1)),
        ],
    )
    row = pair_token_lcs(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert (row["lcs_tokens"], row["start1"], row["start2"]) == (8, 0, 9)


def test_repeat_valve_raises(spark):
    docs = _toks(spark, [(1, _w("a b c d e f g h") * 40), (2, _w("a b"))])
    with pytest.raises(ValueError, match="repeats"):
        pair_token_lcs(
            _pairs(spark, [(1, 2)]), docs, k=8, max_gram_repeat=10
        ).collect()


def test_pairs_universe_preserved(spark):
    # output has exactly one row per input pair, matched or not
    docs = _toks(spark, [(1, _w("a b c")), (2, _w("x y z")), (3, _w("a b c"))])
    out = pair_token_lcs(_pairs(spark, [(1, 2), (1, 3), (2, 3)]), docs, k=8)
    assert out.count() == 3
    assert out.where(F.col("lcs_tokens") > 0).count() == 0  # all docs < k tokens
