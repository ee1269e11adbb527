"""source_dedup_ledger: per-source exact-dedup cost in docs and tokens."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.dedup import source_dedup_ledger


def test_ledger_survivor_rule_and_token_accounting(spark):
    docs = spark.createDataFrame(
        [
            # srcA doc 1 (4 tokens) duplicated into srcB twice (ids 5, 6)
            (1, "srcA", "one two three four"),
            (5, "srcB", "one two three four"),
            (6, "srcB", "one two three four"),
            # unique docs
            (2, "srcA", "aa bb"),
            (7, "srcB", "cc dd ee"),
            # null text: never a duplicate, zero tokens
            (3, "srcA", None),
        ],
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r for r in source_dedup_ledger(docs).collect()}
    a, b = got["srcA"], got["srcB"]
    assert (a["n_docs"], a["n_dup_docs"]) == (3, 0)  # doc 1 is the min-id survivor
    assert (b["n_docs"], b["n_dup_docs"]) == (3, 2)
    assert a["tokens_total"] == 6 and a["tokens_kept"] == 6
    assert b["tokens_total"] == 11 and b["tokens_kept"] == 3  # both copies charged
    assert a["kept_ppm"] == 1_000_000
    assert b["kept_ppm"] == 272_727  # floor(3e6/11)


def test_ledger_intra_source_duplicates_charged(spark):
    docs = spark.createDataFrame(
        [(1, "s", "x y z"), (2, "s", "x y z"), (3, "s", "x y z")],
        "doc_id long, source string, text string",
    )
    r = source_dedup_ledger(docs).collect()[0]
    assert (r["n_docs"], r["n_dup_docs"]) == (3, 2)
    assert r["tokens_kept"] == 3 and r["kept_ppm"] == 333_333
