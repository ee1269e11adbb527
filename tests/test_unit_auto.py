"""unit="auto": the corpus probe that routes unsegmented scripts to char
granularity (api.resolve_signature_unit), and its end-to-end equivalence
with an explicit unit on both corpus kinds."""

import numpy as np
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api


def _spaceless_docs(spark, n=90, length=300, seed=3):
    rng = np.random.RandomState(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rows = []
    for i in range(n):
        base = "".join(alpha[int(x)] for x in rng.randint(0, 26, length))
        rows.append((i, base))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spaced_docs(spark, n=90, seed=4):
    rng = np.random.RandomState(seed)
    rows = [
        (i, " ".join(f"w{int(x)}" for x in rng.randint(0, 50, 60)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_routes_by_space_density(spark):
    assert api.resolve_signature_unit(_spaceless_docs(spark), "text") == "char"
    assert api.resolve_signature_unit(_spaced_docs(spark), "text") == "token"


def test_probe_partitioning_invariant_and_small_corpus_fallback(spark):
    sl = _spaceless_docs(spark, n=10)  # < sample_mod: sample may be empty
    assert api.resolve_signature_unit(sl, "text") == "char"
    assert api.resolve_signature_unit(sl.repartition(7), "text") == "char"
    big = _spaceless_docs(spark, n=90)
    assert (
        api.resolve_signature_unit(big.repartition(1), "text")
        == api.resolve_signature_unit(big.repartition(13), "text")
        == "char"
    )


def test_probe_empty_and_null_corpus_defaults_token(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert api.resolve_signature_unit(empty, "text") == "token"
    nulls = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    # empty/null docs never vote char
    assert api.resolve_signature_unit(nulls, "text") == "token"


def test_refs_search_char_unit(spark):
    """search_with_references serves unsegmented corpora: unit='auto'
    probes the candidate side and equals the explicit char run."""
    from vid_dup_finder_lib_spark.config import SigConfig

    cfg = SigConfig(lsh_bands=64)
    cands = _spaceless_docs(spark, n=10, length=400, seed=11)
    refs = cands.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 500).alias("doc_id"),
        F.concat(F.lit("zz"), F.substring("text", 3, 10_000)).alias("text"),
    )
    kw = dict(tolerance=0.3, cfg=cfg, id_col="doc_id")
    auto = sorted(map(tuple, api.search_with_references(
        refs, cands, unit="auto", **kw).select("ref_id", "cand_id").collect()))
    char = sorted(map(tuple, api.search_with_references(
        refs, cands, unit="char", **kw).select("ref_id", "cand_id").collect()))
    assert auto == char and len(auto) >= 3


def test_auto_equals_explicit_unit_end_to_end(spark):
    from vid_dup_finder_lib_spark.config import SigConfig

    cfg = SigConfig(lsh_bands=64)
    # spaceless near-dups: base + one lightly-edited copy per base
    base = _spaceless_docs(spark, n=12, length=400, seed=9)
    edited = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.lit("zz"), F.substring("text", 3, 10_000)).alias("text"),
    )
    docs = base.unionByName(edited).localCheckpoint()
    auto = sorted(
        map(tuple, api.find_edges(docs, 0.3, cfg, id_col="doc_id", unit="auto")
            .select("id1", "id2").collect())
    )
    char = sorted(
        map(tuple, api.find_edges(docs, 0.3, cfg, id_col="doc_id", unit="char")
            .select("id1", "id2").collect())
    )
    assert auto == char and len(auto) >= 12
