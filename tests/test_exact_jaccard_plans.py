"""The three EXACT all-pairs Jaccard physical plans agree bit-for-bit.

Round-5 replacement for the char-gram df valve (which traded recall —
589/600 at sf0.01): ``prefix_jaccard_pairs`` (AllPairs/PPJoin, right for
Zipfian gram universes) and ``gram_matrix_jaccard_pairs`` (blocked 0/1
Gram matmul, right for dense universes) are both lossless, and
``exact_jaccard_pairs_auto`` picks between them from the measured
universe.  Every test here pins plan-equivalence against the naive
explode + equi-join — the semantics oracle.
"""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions.text import (
    char_shingles_col,
    shingle_hashes_col,
)
from vid_dup_finder_lib_spark.operators.dedup import (
    char_ngram_jaccard_pairs,
    exact_jaccard_pairs_auto,
    gram_matrix_jaccard_pairs,
    prefix_jaccard_pairs,
)


def _corpus(spark):
    """Synthetic unsegmented corpus with planted near-dups, an exact dup,
    a sub-threshold neighbor, a too-short doc (empty shingle set), and a
    disjoint singleton."""
    base = "".join(chr(0x4E00 + (i * 37) % 800) for i in range(300))
    other = "".join(chr(0x5500 + (i * 11) % 500) for i in range(300))
    rows = [
        (1, base),
        (2, base[:100] + "仟仠" + base[102:]),  # near-dup of 1
        (3, base),  # exact dup of 1
        (4, base[:150] + other[:150]),  # ~half overlap — borderline
        (5, other),
        (6, "仟仠"),  # < 5 chars -> empty gram set
        (7, other[:50] + base[200:]),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sets(docs):
    return docs.select(
        "doc_id",
        shingle_hashes_col(char_shingles_col(F.col("text"), 5)).alias("shs"),
    )


def _pairs(df):
    return sorted(
        (r["id1"], r["id2"], r["inter_count"], r["union_count"])
        for r in df.collect()
    )


@pytest.mark.parametrize("num,den", [(1, 2), (9, 10), (1, 100), (1, 1)])
def test_three_plans_agree(spark, num, den):
    docs = _corpus(spark)
    sets = _sets(docs)
    naive = _pairs(char_ngram_jaccard_pairs(docs, 5, num, den))
    prefix = _pairs(prefix_jaccard_pairs(sets, num, den, id_col="doc_id"))
    matrix = _pairs(gram_matrix_jaccard_pairs(sets, num, den, id_col="doc_id"))
    assert naive == prefix == matrix
    if (num, den) == (1, 2):
        got = {(i1, i2) for i1, i2, _, _ in naive}
        assert (1, 2) in got and (1, 3) in got and (2, 3) in got


def test_block_count_invariance(spark):
    sets = _sets(_corpus(spark))
    ref = _pairs(gram_matrix_jaccard_pairs(sets, 1, 2, id_col="doc_id", n_blocks=1))
    for nb in (2, 3, 5):
        assert (
            _pairs(gram_matrix_jaccard_pairs(sets, 1, 2, id_col="doc_id", n_blocks=nb))
            == ref
        )


def test_auto_dispatch_both_routes(spark):
    """Same result whichever side of the universe gate the corpus lands on:
    the default gate routes this corpus dense (universe ~10^3), a gate of 1
    forces an inverted-index route (prefix or naive by the df-head rule)."""
    sets = _sets(_corpus(spark))
    dense = _pairs(exact_jaccard_pairs_auto(sets, 1, 2, id_col="doc_id"))
    sparse = _pairs(
        exact_jaccard_pairs_auto(sets, 1, 2, id_col="doc_id", dense_max_universe=1)
    )
    assert dense == sparse == _pairs(char_ngram_jaccard_pairs(_corpus(spark), 5, 1, 2))


def test_matrix_universe_gate_raises(spark):
    sets = _sets(_corpus(spark))
    with pytest.raises(ValueError, match="exceeds"):
        gram_matrix_jaccard_pairs(sets, 1, 2, id_col="doc_id", max_universe=1).count()


def test_matrix_requires_integral_ids(spark):
    docs = spark.createDataFrame(
        [("u1", "abcdefghij" * 10), ("u2", "abcdefghij" * 10)],
        "doc_id string, text string",
    )
    with pytest.raises(Exception, match="integral ids"):
        gram_matrix_jaccard_pairs(_sets(docs), 1, 2, id_col="doc_id").count()


def test_prefix_filter_is_lossless_on_hot_gram_corpus(spark):
    """The failure mode the old valve had: pairs whose overlap includes
    corpus-frequent grams.  Prefix filtering must keep them (the valve
    dropped 11/600 at sf0.01)."""
    # every doc shares the hot run 'zzzzzzzzzz'; docs 100/101 are near-dups
    # whose overlap is mostly the hot run plus a few rare grams
    rows = [
        (i, "zzzzzzzzzz" + "".join(chr(0x4E00 + (i * j) % 97) for j in range(8)))
        for i in range(1, 9)
    ]
    rows.append((100, "zzzzzzzzzz" + "abcdefgh"))
    rows.append((101, "zzzzzzzzzz" + "abcdefgX"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    naive = _pairs(char_ngram_jaccard_pairs(docs, 5, 1, 2))
    prefix = _pairs(prefix_jaccard_pairs(_sets(docs), 1, 2, id_col="doc_id"))
    assert prefix == naive
    assert (100, 101) in {(a, b) for a, b, _, _ in naive}
    # this head-heavy corpus is exactly the shape the dispatcher routes to
    # prefix when the matrix is gated off; result must be unchanged
    routed = _pairs(
        exact_jaccard_pairs_auto(
            _sets(docs), 1, 2, id_col="doc_id", dense_max_universe=1
        )
    )
    assert routed == naive


def test_cost_rule_measured_statistics():
    """The dispatcher's cost rule reproduces ALL measured sf0.1 outcomes:
    dense char universe (U=7,175, sum_df2=5.6e8) -> matrix (measured 6 s vs
    34 s naive vs 76 s prefix); mild token universe (U=29,940, max_df=52,
    sum_df2=8.6e6) -> naive (measured 3.0 s vs 6.2 s prefix vs a ~1.5 TFLOP
    matmul); head-heavy (Zipf) df over a too-big universe -> prefix."""
    from vid_dup_finder_lib_spark.operators.dedup import _choose_exact_plan

    choose = lambda n, u, s2, mx: _choose_exact_plan(n, u, s2, mx, 1 << 20, 4096)
    assert choose(10_000, 7_175, 560_000_000, 3_000) == "matrix"
    assert choose(10_000, 29_940, 8_600_000, 52) == "naive"
    # Zipf head over the dense axis: one df=3e5 gram carries the join cost
    assert choose(1_000_000, (1 << 21), 10**12, 300_000) == "prefix"
    # big universe, mild df -> naive
    assert choose(1_000_000, (1 << 21), 10**9, 100) == "naive"
    # dense-but-uniform corpus with the matrix gated off (tiny
    # dense_max_universe): prefix must NOT be chosen — it loses on a
    # universe with no rare grams (76 s vs 34 s measured)
    assert (
        _choose_exact_plan(10_000, 7_175, 560_000_000, 3_000, 1, 4096) == "naive"
    )
    # tiny corpus -> matmul flops vanish -> matrix
    assert choose(100, 1_000, 100_000, 50) == "matrix"
