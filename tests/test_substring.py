"""Substring (rolling-window) pass: true-winnowing guarantee.

Schleimer et al. winnowing contract: any shared verbatim run of
>= L + W - 1 tokens yields at least one shared fingerprint at winnow=W —
deterministically, for every seed (the round-2 mod-sampling gave only
expected coverage; this test is the regression gate for the difference).
"""

import random

from vid_dup_finder_lib_spark.operators.substring import substring_pairs

L = 5
W = 4


def _rand_tokens(rng, prefix, n):
    return [f"{prefix}{rng.randrange(10**9)}x{i}" for i in range(n)]


def test_winnowing_guarantees_minimal_shared_run(spark):
    """Plant runs of EXACTLY L+W-1 tokens (the minimal guaranteed length)
    shared between doc pairs at random positions inside otherwise-disjoint
    random text, across many seeds in one job; every planted pair must be
    found at winnow=W."""
    rows = []
    expected = set()
    for seed in range(20):
        rng = random.Random(1000 + seed)
        run = _rand_tokens(rng, f"run{seed}_", L + W - 1)
        a_pre = _rand_tokens(rng, f"a{seed}_", rng.randrange(0, 30))
        a_post = _rand_tokens(rng, f"A{seed}_", rng.randrange(0, 30))
        b_pre = _rand_tokens(rng, f"b{seed}_", rng.randrange(0, 30))
        b_post = _rand_tokens(rng, f"B{seed}_", rng.randrange(0, 30))
        id_a, id_b = 2 * seed, 2 * seed + 1
        rows.append((id_a, " ".join(a_pre + run + a_post)))
        rows.append((id_b, " ".join(b_pre + run + b_post)))
        expected.add((id_a, id_b))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id1, r.id2)
        for r in substring_pairs(
            docs, L, id_col="doc_id", text_col="text", winnow=W
        ).collect()
    }
    assert expected <= got, f"missing planted pairs: {expected - got}"
    # disjoint alphabets between pairs: nothing beyond the planted pairs
    assert got == expected


def test_winnowing_short_doc_keeps_one_fingerprint(spark):
    """A doc with >= L tokens but fewer than W windows still emits its
    minimum window hash — identical short docs pair up under winnowing."""
    text = "alpha beta gamma delta epsilon"  # exactly L tokens -> 1 window
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    got = {
        (r.id1, r.id2)
        for r in substring_pairs(
            docs, L, id_col="doc_id", text_col="text", winnow=W
        ).collect()
    }
    assert got == {(1, 2)}


def test_winnow_one_is_exact_and_counts_shared_windows(spark):
    """winnow=1 keeps every window (the oracle-checked exact path): two docs
    sharing a single L-window report shared_windows == 1; no false pairs."""
    docs = spark.createDataFrame(
        [
            (1, "p q r s t u v w"),
            (2, "x y r s t u v z"),   # shares windows of 'r s t u v' only
            (3, "completely different tokens here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.id1, r.id2): r.shared_windows
        for r in substring_pairs(docs, L, id_col="doc_id", text_col="text").collect()
    }
    assert out == {(1, 2): 1}
