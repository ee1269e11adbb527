"""api.explain_pair: the one-row-per-pair review diagnostic."""

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig


def test_explain_pair_composes_all_diagnostics(spark):
    base = " ".join(f"w{i}" for i in range(60))
    toks = base.split()
    edited = list(toks)
    for p in (10, 30, 50):
        edited[p] = "zz"
    docs = spark.createDataFrame(
        [
            ("a", base),
            ("b", " ".join(edited)),
            ("c", " ".join(f"q{i}" for i in range(60))),
        ],
        "url string, text string",
    )
    pairs = spark.createDataFrame([("a", "b"), ("a", "c")], "id1 string, id2 string")
    rows = {
        (r["id1"], r["id2"]): r
        for r in api.explain_pair(docs, pairs, cfg=SigConfig(seed=1)).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c")}

    ab = rows[("a", "b")]
    # 3 single-token edits at distance 20 apart -> longest run 19 tokens
    assert ab["lcs_tokens"] == 19
    assert ab["token_hamming"] == 3
    assert ab["inter_count"] > 0 and ab["union_count"] > ab["inter_count"]
    assert ab["n_tokens1"] == 60 and ab["n_tokens2"] == 60
    # covered = everything except the 8-gram shadows of the 3 edits
    assert 0 < ab["covered1"] <= 60
    assert 0 < ab["coverage1_ppm"] <= 1_000_000
    assert ab["n_shared"] > 0 and ab["n_only1"] == ab["n_only2"] > 0

    ac = rows[("a", "c")]
    assert ac["lcs_tokens"] == 0 and ac["inter_count"] == 0
    assert ac["n_shared"] == 0 and ac["coverage1_ppm"] == 0


def test_explain_pair_prunes_to_pair_docs(spark):
    # corpus has 100 docs; only the 2 referenced ones are signatured
    docs = spark.createDataFrame(
        [(str(i), f"text number {i} " * 10) for i in range(100)],
        "url string, text string",
    )
    pairs = spark.createDataFrame([("3", "7")], "id1 string, id2 string")
    out = api.explain_pair(docs, pairs)
    assert out.count() == 1
