"""duplicate_span_rewrite: corpus-level ExactSubstr span removal.

Semantics under test (the documented contract, mirrored by the DuckDB
oracle twin): a duplicated >= k-token span survives only at its globally
minimal (id, pos) occurrence; all other occurrences are cut from the
rewritten text; spans shorter than k are invisible.
"""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.substring import duplicate_span_rewrite


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_cross_doc_quote_removed_from_later_doc(spark):
    quote = _words("s", 25)  # 25-token span shared by both docs
    rows = [
        (1, quote + " " + _words("a", 10)),
        (2, _words("b", 10) + " " + quote + " " + _words("c", 10)),
    ]
    out = _by_id(duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id"))
    # doc 1 holds the canonical occurrence: untouched
    assert out[1]["removed_tokens"] == 0
    assert out[1]["kept_text"] == rows[0][1]
    # doc 2 loses exactly the 25 quoted tokens, keeps its own material
    assert out[2]["n_tokens"] == 45
    assert out[2]["removed_tokens"] == 25
    assert out[2]["kept_text"] == _words("b", 10) + " " + _words("c", 10)
    assert out[2]["removed_ppm"] == 25 * 1_000_000 // 45


def test_intra_doc_repeat_keeps_first_occurrence(spark):
    block = _words("r", 20)
    rows = [(7, block + " " + _words("m", 5) + " " + block)]
    out = _by_id(duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id"))
    assert out[7]["n_tokens"] == 45
    assert out[7]["removed_tokens"] == 20
    assert out[7]["kept_text"] == block + " " + _words("m", 5)


def test_exact_duplicate_doc_fully_removed(spark):
    body = _words("d", 30)
    rows = [(1, body), (2, body)]
    out = _by_id(duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id"))
    assert out[1]["kept_text"] == body and out[1]["removed_tokens"] == 0
    assert out[2]["kept_text"] == "" and out[2]["removed_tokens"] == 30
    assert out[2]["removed_ppm"] == 1_000_000


def test_short_spans_and_short_docs_invisible(spark):
    shared = _words("s", 10)  # below k=20: must NOT trigger removal
    rows = [
        (1, shared + " " + _words("a", 15)),
        (2, shared + " " + _words("b", 15)),
        (3, _words("tiny", 5)),
        (4, ""),
        (5, None),  # null text == empty text (kernel fill_null contract)
    ]
    out = _by_id(duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id"))
    for i in (1, 2, 3, 4, 5):
        assert out[i]["removed_tokens"] == 0
        assert out[i]["removed_ppm"] == 0
    assert out[3]["kept_text"] == _words("tiny", 5)
    assert out[4]["n_tokens"] == 0 and out[4]["kept_text"] == ""
    assert out[5]["n_tokens"] == 0 and out[5]["kept_text"] == ""


def test_overlapping_spans_merge_without_double_count(spark):
    # doc 2 contains two quotes of doc 1 that overlap once merged:
    # [0..24] and [15..39] -> one covered interval [0..39]
    base = _words("s", 40)
    toks = base.split(" ")
    rows = [
        (1, base + " " + _words("a", 5)),
        (2, " ".join(toks[0:25]) + " zz1 zz2 " + " ".join(toks[15:40]) + " " + _words("c", 5)),
    ]
    out = _by_id(duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id"))
    assert out[1]["removed_tokens"] == 0
    # both quote blocks removed in full, own tokens kept
    assert out[2]["kept_text"] == "zz1 zz2 " + _words("c", 5)
    assert out[2]["removed_tokens"] == 50


def test_partition_invariance(spark):
    quote = _words("s", 25)
    rows = [(i, quote + " " + _words(f"u{i}_", 8)) for i in range(1, 9)]
    df = _mk(spark, rows)
    a = sorted(duplicate_span_rewrite(df, k=20, id_col="doc_id").collect())
    b = sorted(
        duplicate_span_rewrite(df.repartition(7), k=20, id_col="doc_id").collect()
    )
    assert a == b
    # only doc 1 (global min id) keeps the quote
    by = {r["doc_id"]: r for r in a}
    assert by[1]["removed_tokens"] == 0
    for i in range(2, 9):
        assert by[i]["removed_tokens"] == 25


def test_consistency_removed_equals_token_delta(spark):
    quote = _words("s", 22)
    rows = [
        (1, quote),
        (2, _words("x", 4) + " " + quote + " " + _words("y", 3)),
        (3, _words("z", 12)),
    ]
    out = duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id")
    chk = out.select(
        "doc_id",
        (
            F.col("n_tokens")
            - F.when(F.col("kept_text") == "", 0).otherwise(
                F.size(F.split("kept_text", " "))
            )
            - F.col("removed_tokens")
        ).alias("delta"),
    )
    assert all(r["delta"] == 0 for r in chk.collect())


def test_preserve_case_matches_insensitively_rebuilds_faithfully(spark):
    """Case-variant copies of a span still count as duplicates, but the
    surviving text keeps its ORIGINAL case; the doc holding the canonical
    occurrence is untouched byte-for-byte (modulo whitespace collapse)."""
    quote_lower = _words("s", 25)
    quote_upper = quote_lower.upper()
    rows = [
        (1, quote_upper + " " + "Alpha Tail One Two"),
        (2, "Beta Head " + quote_lower + " Gamma Tail"),
    ]
    out = _by_id(
        duplicate_span_rewrite(
            _mk(spark, rows), k=20, id_col="doc_id", preserve_case=True
        )
    )
    # doc 1 canonical: keeps the UPPER quote verbatim
    assert out[1]["removed_tokens"] == 0
    assert out[1]["kept_text"] == rows[0][1]
    # doc 2 loses the lower-case variant, keeps its own mixed-case words
    assert out[2]["removed_tokens"] == 25
    assert out[2]["kept_text"] == "Beta Head Gamma Tail"
    # default mode lowercases the rebuilt text but removes the same spans
    norm = _by_id(duplicate_span_rewrite(_mk(spark, rows), k=20, id_col="doc_id"))
    assert norm[2]["removed_tokens"] == 25
    assert norm[2]["kept_text"] == "beta head gamma tail"


def test_span_sources_points_at_canonical(spark):
    """duplicate_span_sources: the quote doc reports one maximal span per
    source with the canonical (id, offset); the canonical doc reports
    nothing."""
    from vid_dup_finder_lib_spark.operators.substring import (
        duplicate_span_sources,
    )

    quote = _words("s", 25)
    rows = [
        (1, quote + " " + _words("a", 10)),
        (2, _words("b", 10) + " " + quote + " " + _words("c", 10)),
    ]
    out = duplicate_span_sources(_mk(spark, rows), k=20, id_col="doc_id").collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r == {
        "doc_id": 2, "start": 10, "span_tokens": 25,
        "src_id": 1, "src_start": 0,
    }


def test_span_sources_cover_exactly_what_rewrite_removes(spark):
    """Invariant: per doc, the interval union of the reported spans equals
    the token count the rewrite removed — the explain view and the rewrite
    describe the same cuts."""
    from vid_dup_finder_lib_spark.operators.substring import (
        duplicate_span_sources,
    )

    base = _words("s", 40)
    toks = base.split(" ")
    rows = [
        (1, base + " " + _words("a", 5)),
        (2, " ".join(toks[0:25]) + " zz1 zz2 " + " ".join(toks[15:40]) + " " + _words("c", 5)),
        (3, base),  # full copy
        (4, _words("u", 30)),  # unique
    ]
    df = _mk(spark, rows)
    spans = duplicate_span_sources(df, k=20, id_col="doc_id").collect()
    removed = {
        r["doc_id"]: r["removed_tokens"]
        for r in duplicate_span_rewrite(df, k=20, id_col="doc_id").collect()
    }
    cover: dict[int, set[int]] = {}
    for r in spans:
        cover.setdefault(r["doc_id"], set()).update(
            range(r["start"], r["start"] + r["span_tokens"])
        )
    for i in removed:
        assert len(cover.get(i, set())) == removed[i], f"doc {i}"


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k must be >= 2"):
        duplicate_span_rewrite(_mk(spark, [(1, "a b")]), k=1, id_col="doc_id")
