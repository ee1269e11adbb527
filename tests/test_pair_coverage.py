"""pair_verbatim_coverage: interval-union dup-coverage per pair."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.substring import pair_verbatim_coverage


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id1 long, id2 long")


def _w(s):
    return s.split()


def test_two_disjoint_runs_sum(spark):
    # doc2 = run A (10) + junk + run B (8); doc1 holds both runs
    run_a = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    run_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = _toks(
        spark,
        [
            (1, _w(run_a + " x1 x2 " + run_b)),          # 20 tokens
            (2, _w(run_a + " y1 y2 y3 " + run_b + " y4")),  # 22 tokens
        ],
    )
    r = pair_verbatim_coverage(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert (r["n_tokens1"], r["n_tokens2"]) == (20, 22)
    assert r["covered1"] == 18 and r["covered2"] == 18
    assert r["coverage1_ppm"] == 900_000          # 18/20
    assert r["coverage2_ppm"] == 818_181          # floor(18e6/22)


def test_overlapping_runs_never_double_count(spark):
    # doc1 repeats the same 12-token passage twice; doc2 has it once.
    # doc2's single copy matches BOTH doc1 copies (two diagonals) but its
    # covered2 must still be 12, not 24.
    p = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    docs = _toks(
        spark,
        [
            (1, _w(p + " m1 m2 " + p)),   # 26 tokens
            (2, _w(p + " q1 q2 q3")),     # 15 tokens
        ],
    )
    r = pair_verbatim_coverage(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert r["covered2"] == 12
    assert r["covered1"] == 24  # both copies in doc1 are covered
    assert r["coverage2_ppm"] == 800_000


def test_full_containment_is_million_ppm(spark):
    inner = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    docs = _toks(
        spark,
        [(1, _w(inner)), (2, _w("w1 w2 " + inner + " w3 w4"))],
    )
    r = pair_verbatim_coverage(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert r["coverage1_ppm"] == 1_000_000  # doc1 wholly inside doc2
    assert r["covered2"] == 10 and r["n_tokens2"] == 14


def test_no_shared_runs_zero(spark):
    docs = _toks(spark, [(1, _w("a b c d e f g h")), (2, _w("q r s t u v w x"))])
    r = pair_verbatim_coverage(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert (r["covered1"], r["covered2"]) == (0, 0)
    assert (r["coverage1_ppm"], r["coverage2_ppm"]) == (0, 0)
    assert pair_verbatim_coverage(_pairs(spark, [(1, 2)]), docs, k=8).count() == 1


def test_coverage_bounded_by_doc(spark):
    # adjacent overlapping matches collapse to one interval <= doc length
    base = [f"t{i}" for i in range(30)]
    edited = list(base)
    edited[15] = "zz"
    docs = _toks(spark, [(1, base), (2, edited)])
    r = pair_verbatim_coverage(_pairs(spark, [(1, 2)]), docs, k=8).collect()[0]
    assert r["covered1"] == 29  # all but the edit point's token itself
    assert r["covered1"] <= r["n_tokens1"]
    assert 0 <= r["coverage1_ppm"] <= 1_000_000


def test_naive_parity_randomized(spark):
    # engine coverage must equal a serial brute-force twin (enumerate all
    # k-gram matches, build diagonal islands, union the intervals)
    import random

    rng = random.Random(11)
    alphabet = [f"t{i}" for i in range(10)]
    K = 8

    def naive_cov(a, b):
        matches = [
            (i, j)
            for i in range(len(a) - K + 1)
            for j in range(len(b) - K + 1)
            if a[i : i + K] == b[j : j + K]
        ]
        runs = {}
        for i, j in sorted(matches):
            d = i - j
            # island start: extend from the previous match on this diagonal
            if (d, i - 1) in runs:
                runs[(d, i)] = runs.pop((d, i - 1))
            else:
                runs[(d, i)] = (i, j)
        iv1, iv2 = [], []
        for (d, last_i), (si, sj) in runs.items():
            ln = last_i - si + K
            iv1.append((si, si + ln - 1))
            iv2.append((sj, sj + ln - 1))

        def union_len(ivs):
            total, cur = 0, None
            for s, e in sorted(ivs):
                if cur is None or s > cur[1]:
                    if cur:
                        total += cur[1] - cur[0] + 1
                    cur = [s, e]
                else:
                    cur[1] = max(cur[1], e)
            if cur:
                total += cur[1] - cur[0] + 1
            return total

        return union_len(iv1), union_len(iv2)

    docs, pairs, expect = [], [], {}
    for n in range(6):
        a = [rng.choice(alphabet) for _ in range(50)]
        b = list(a)
        for pos in sorted(rng.sample(range(50), rng.randint(1, 5))):
            b[pos] = "zz"
        # occasionally duplicate a slice inside b (multi-diagonal overlap)
        if n % 2 == 0:
            b = b[:20] + a[5:15] + b[20:]
        docs.append((2 * n, a))
        docs.append((2 * n + 1, b))
        pairs.append((2 * n, 2 * n + 1))
        expect[(2 * n, 2 * n + 1)] = naive_cov(a, b)

    got = {
        (r["id1"], r["id2"]): (r["covered1"], r["covered2"])
        for r in pair_verbatim_coverage(
            _pairs(spark, pairs), _toks(spark, docs), k=K
        ).collect()
    }
    assert got == expect


def test_missing_doc_keeps_pair_row(spark):
    # a pair referencing a doc absent from tokens keeps its row with zeros
    docs = _toks(spark, [(1, _w("a b c d e f g h i"))])
    r = pair_verbatim_coverage(_pairs(spark, [(1, 99)]), docs, k=8).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_tokens2"], row["covered2"], row["coverage2_ppm"]) == (0, 0, 0)
    assert row["n_tokens1"] == 9
