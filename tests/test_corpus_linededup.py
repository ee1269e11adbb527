"""Corpus-level frequent-line strip + per-key dup share: semantics the
oracle gate can't see (valves, distinct-by-doc df, partitioning
invariance, flag boundaries)."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.boilerplate import (
    FrequentLineSetTooLarge,
    strip_frequent_lines,
)
from vid_dup_finder_lib_spark.operators.dedup import dup_share_by_key

MD5_EMPTY = "d41d8cd98f00b204e9800998ecf8427e"


def _lined(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


@pytest.fixture(scope="module")
def lined(spark):
    # "shared" appears in 3 docs (df=3 -> stripped at min_df=3);
    # "twice twice" repeats WITHIN doc 4 only (df=1 -> kept: df counts
    # distinct docs, not occurrences); "rare" df=2 -> kept
    return _lined(
        spark,
        [
            (1, ["alpha one", "shared", "beta one"]),
            (2, ["shared", "gamma two"]),
            (3, ["delta three", "shared"]),
            (4, ["twice twice", "twice twice", "rare"]),
            (5, ["rare", "epsilon five"]),
            (6, []),
        ],
    )


def test_strip_semantics(spark, lined):
    out = {
        r["doc_id"]: r
        for r in strip_frequent_lines(lined, min_df=3).collect()
    }
    assert len(out) == 6
    # df=3 line stripped everywhere, interior or edge
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == 1
    # within-doc repetition does not reach df: all lines kept
    assert out[4]["n_kept"] == 3
    assert out[5]["n_kept"] == 2
    # empty docs keep the empty-string hash
    assert out[6]["n_lines"] == 0
    assert out[6]["n_kept"] == 0
    assert out[6]["kept_md5"] == MD5_EMPTY
    # kept_md5 preserves original order (join by \n)
    import hashlib

    assert (
        out[1]["kept_md5"]
        == hashlib.md5(b"alpha one\nbeta one").hexdigest()
    )


def test_strip_all_frequent_doc(spark):
    # a doc made entirely of frequent lines survives with the empty hash
    lined = _lined(
        spark,
        [(1, ["bp"]), (2, ["bp"]), (3, ["bp"]), (4, ["bp", "own line"])],
    )
    out = {r["doc_id"]: r for r in strip_frequent_lines(lined, min_df=3).collect()}
    assert out[1]["n_kept"] == 0 and out[1]["kept_md5"] == MD5_EMPTY
    assert out[4]["n_kept"] == 1


def test_strip_valve_and_min_df(spark, lined):
    with pytest.raises(ValueError, match="min_df"):
        strip_frequent_lines(lined, min_df=1)
    with pytest.raises(FrequentLineSetTooLarge, match="valve"):
        strip_frequent_lines(lined, min_df=2, max_frequent_lines=0)


def test_strip_partitioning_invariance(spark, lined):
    a = sorted(
        strip_frequent_lines(lined.repartition(1), min_df=3).collect()
    )
    b = sorted(
        strip_frequent_lines(lined.repartition(16), min_df=3).collect()
    )
    assert a == b


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dup_share_flag_boundary_and_nulls(spark):
    docs = _docs(
        spark,
        [
            # site a: 2 of 4 docs are dups -> share exactly 1/2, strict > -> NOT flagged
            (1, "a", "dup text"),
            (2, "a", "dup text"),
            (3, "a", "unique one"),
            (4, "a", "unique two"),
            # site b: 2 of 3 -> flagged
            (5, "b", "other dup"),
            (6, "b", "other dup"),
            (7, "b", "unique three"),
            # site c: null texts are never duplicates of each other
            (8, "c", None),
            (9, "c", None),
        ],
    )
    out = {r["source"]: r for r in dup_share_by_key(docs).collect()}
    assert out["a"]["n_docs"] == 4 and out["a"]["n_dup_docs"] == 2
    assert out["a"]["dup_flag"] is False
    assert out["b"]["n_dup_docs"] == 2 and out["b"]["dup_flag"] is True
    assert out["c"]["n_docs"] == 2 and out["c"]["n_dup_docs"] == 0
    assert out["c"]["dup_flag"] is False


def test_dup_share_cross_key_classes(spark):
    # dup classes span keys: the mirror pattern — every mirror doc
    # duplicates an organic one, so BOTH sides count as dups
    docs = _docs(
        spark,
        [
            (1, "org", "page one"),
            (2, "org", "page two"),
            (3, "mirror", "page one"),
            (4, "mirror", "page two"),
        ],
    )
    out = {r["source"]: r for r in dup_share_by_key(docs).collect()}
    assert out["org"]["n_dup_docs"] == 2 and out["org"]["dup_flag"] is True
    assert out["mirror"]["n_dup_docs"] == 2 and out["mirror"]["dup_flag"] is True


# ---------------------------------------------------------------------------
# dedup_lines_first_wins (RefinedWeb first-occurrence-wins semantics)
# ---------------------------------------------------------------------------

from vid_dup_finder_lib_spark.operators.boilerplate import dedup_lines_first_wins


def _md5_lines(lines):
    import hashlib

    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def fw_lined(spark):
    # "promo" appears in docs 1 (pos 2), 2 (pos 0), 3 (pos 1): only the
    # (1, 2) occurrence survives — id-major order beats the earlier
    # position in doc 2.  Doc 4 repeats its own line: first copy kept.
    # Doc 5 is all-duplicate lines of earlier docs -> zero kept.
    return _lined(
        spark,
        [
            (1, ["alpha one", "beta one", "promo"]),
            (2, ["promo", "gamma two"]),
            (3, ["delta three", "promo", "gamma two"]),
            (4, ["self rep", "self rep", "tail four"]),
            (5, ["promo", "gamma two", "self rep"]),
            (6, []),
        ],
    )


def test_first_wins_semantics(spark, fw_lined):
    out = {r["doc_id"]: r for r in dedup_lines_first_wins(fw_lined).collect()}
    assert len(out) == 6
    # doc 1 owns the global first of every one of its lines
    assert out[1]["n_kept"] == 3
    assert out[1]["kept_md5"] == _md5_lines(["alpha one", "beta one", "promo"])
    # doc 2 loses "promo" to doc 1 despite holding it at pos 0
    assert out[2]["n_kept"] == 1
    assert out[2]["kept_md5"] == _md5_lines(["gamma two"])
    # doc 3 loses both shared lines
    assert out[3]["n_kept"] == 1
    assert out[3]["kept_md5"] == _md5_lines(["delta three"])
    # intra-doc repeat: first copy kept in place, repeat dropped
    assert out[4]["n_kept"] == 2
    assert out[4]["kept_md5"] == _md5_lines(["self rep", "tail four"])
    # all-duplicate doc collapses to the empty rewrite, not a missing row
    assert out[5]["n_lines"] == 3 and out[5]["n_kept"] == 0
    assert out[5]["kept_md5"] == MD5_EMPTY
    assert out[6]["n_lines"] == 0 and out[6]["kept_md5"] == MD5_EMPTY


def test_first_wins_partitioning_invariance(spark, fw_lined):
    a = sorted(map(tuple, dedup_lines_first_wins(fw_lined.repartition(1)).collect()))
    b = sorted(map(tuple, dedup_lines_first_wins(fw_lined.repartition(16)).collect()))
    assert a == b


def test_first_wins_vs_naive(spark, fw_lined):
    # independent naive reimplementation over the same rows
    rows = sorted(
        (r["doc_id"], list(r["lines"] or [])) for r in fw_lined.collect()
    )
    seen: set[str] = set()
    expect = {}
    for doc_id, lines in rows:
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        expect[doc_id] = (len(lines), len(kept), _md5_lines(kept))
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_md5"])
        for r in dedup_lines_first_wins(fw_lined).collect()
    }
    assert got == expect


def test_first_wins_property_random_corpora(spark):
    """Randomized parity vs the naive serial first-wins rule: any corpus of
    docs over a tiny line alphabet (maximizing cross-doc and intra-doc
    collisions) must match the O(n) reference implementation exactly."""
    import random

    rng = random.Random(20260817)
    alphabet = [f"line {c}" for c in "abcdefg"]
    for trial in range(4):
        n_docs = rng.randint(1, 12)
        rows = []
        for i in range(n_docs):
            n_lines = rng.randint(0, 8)
            rows.append(
                (i, [rng.choice(alphabet) for _ in range(n_lines)])
            )
        seen: set[str] = set()
        expect = {}
        for doc_id, lines in rows:
            kept = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    kept.append(ln)
            expect[doc_id] = (len(lines), len(kept), _md5_lines(kept))
        shuffled = rows[:]
        rng.shuffle(shuffled)  # input order must not matter
        got = {
            r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_md5"])
            for r in dedup_lines_first_wins(
                _lined(spark, shuffled).repartition(rng.randint(1, 8))
            ).collect()
        }
        assert got == expect, f"trial {trial}"
