"""char_ngram_jaccard_pairs: dedup for unsegmented scripts."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions.text import (
    char_shingles_col,
    shingles_col,
    tokens_col,
    normalize_text,
)
from vid_dup_finder_lib_spark.operators.dedup import (
    char_ngram_jaccard_pairs,
    ngram_jaccard_pairs,
)
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.config import SigConfig


def test_token_path_blind_char_path_sees(spark):
    # CJK-style unsegmented text: one doc and a lightly-edited copy share
    # no whitespace tokens beyond "the whole string", but share most
    # character 5-grams
    base = "".join(chr(0x4E00 + (i * 37) % 800) for i in range(300))
    edited = base[:100] + "仟仠" + base[102:]
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, "".join(chr(0x5500 + i % 500) for i in range(300)))],
        "doc_id long, text string",
    )
    # token path: each doc is ONE token -> zero 3-token shingles -> blind
    sigs = build_signatures(docs, SigConfig(seed=1), id_col="doc_id", text_col="text")
    assert ngram_jaccard_pairs(sigs, 1, 2).count() == 0
    # char path: the pair is found with high Jaccard
    rows = char_ngram_jaccard_pairs(docs, 5, 1, 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id1"], r["id2"]) == (1, 2)
    assert r["inter_count"] * 10 >= r["union_count"] * 9  # > 0.9


def test_char_shingles_semantics(spark):
    df = spark.createDataFrame([("abcdef",), ("abc",), ("",)], "t string")
    got = df.select(
        char_shingles_col(F.col("t"), 5).alias("g")
    ).collect()
    assert got[0]["g"] == ["abcde", "bcdef"]
    assert got[1]["g"] == []  # shorter than n
    assert got[2]["g"] == []
    # distinctness: repeated grams collapse
    rep = spark.createDataFrame([("aaaaaaa",)], "t string").select(
        char_shingles_col(F.col("t"), 5).alias("g")
    ).collect()[0]["g"]
    assert rep == ["aaaaa"]


def test_df_valve_and_threshold(spark):
    docs = spark.createDataFrame(
        [(i, "xxxxxyyyyyzzzzz") for i in range(1, 5)],
        "doc_id long, text string",
    )
    # identical docs -> C(4,2) pairs at J=1
    assert char_ngram_jaccard_pairs(docs, 5, 1, 1).count() == 6
    # every gram has df 4 > 3 -> all dropped -> no rows
    assert char_ngram_jaccard_pairs(docs, 5, 1, 1, max_shingle_df=3).count() == 0


def test_drop_report_enumerates_valved_grams(spark):
    """char_gram_drop_report is the no-silent-caps twin of the valve: it
    returns exactly the (gram hash, df) rows the max_shingle_df anti-join
    drops, so a valved run can report its recall trade instead of hiding
    it.  Corpus: one gram in all 4 docs (dropped at df>3), plus per-doc
    unique grams (kept)."""
    from vid_dup_finder_lib_spark.operators.dedup import char_gram_drop_report

    docs = spark.createDataFrame(
        [(i, "sharedgram" + chr(97 + i) * 6) for i in range(1, 5)],
        "doc_id long, text string",
    )
    rep = char_gram_drop_report(docs, 5, max_shingle_df=3).collect()
    # exactly the 6 grams of "sharedgram" (10 chars -> 6 5-grams), df=4 each
    assert len(rep) == 6
    assert all(r["df"] == 4 for r in rep)
    # valve semantics consistency: with the hot grams dropped the docs
    # share nothing, so no pair can reach J >= threshold over the FULL
    # (pre-valve) union
    assert (
        char_ngram_jaccard_pairs(docs, 5, 1, 2, max_shingle_df=3).count() == 0
    )
    # and without the valve every pair shares the 6 hot grams
    assert char_ngram_jaccard_pairs(docs, 5, 1, 100).count() == 6


def test_char_unit_signatures_contract(spark):
    """build_signatures(unit='char'): doclen = character count (spaces are
    not characters), content_hash = sha2 of the ORIGINAL text (exact-dup
    identity is unit-independent), and the LSH+verify chain finds the
    unsegmented near-dup the token unit cannot."""
    import hashlib

    from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
    from vid_dup_finder_lib_spark.operators.verify import verified_edges

    base = "".join(chr(0x4E00 + (i * 37) % 800) for i in range(300))
    edited = base[:100] + "仟仠" + base[102:]
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    cfg = SigConfig(num_perms=128, lsh_bands=64, seed=42, shingle_k=5)
    sigs = build_signatures(
        docs, cfg, id_col="doc_id", text_col="text", unit="char"
    ).localCheckpoint()
    rows = {r["id"]: r for r in sigs.collect()}
    assert rows[1]["doclen"] == 300  # characters, not whitespace tokens
    assert rows[1]["content_hash"] == hashlib.sha256(base.encode()).hexdigest()
    assert rows[1]["shingle_count"] > 200  # ~n-k+1 distinct char grams

    pairs, _q = candidate_pairs(sigs, cfg)
    edges = verified_edges(
        pairs, sigs, cfg, jaccard_num_den=(1, 2), length_band=False
    ).collect()
    assert len(edges) == 1
    assert (edges[0]["id1"], edges[0]["id2"]) == (1, 2)

    # token unit on the same corpus: one giant token, zero shingles
    tok_sigs = build_signatures(docs, cfg, id_col="doc_id", text_col="text")
    assert tok_sigs.where(F.col("shingle_count") > 0).count() == 0

    import pytest

    with pytest.raises(ValueError, match="signature unit"):
        build_signatures(docs, cfg, id_col="doc_id", text_col="text", unit="word")


def test_api_search_char_unit(spark):
    """api.search(unit='char'): the public one-call search groups an
    unsegmented near-dup pair that the token unit cannot see at all."""
    from vid_dup_finder_lib_spark import api

    base = "".join(chr(0x4E00 + (i * 53) % 900) for i in range(400))
    near = base[:200] + "仡仢代" + base[203:]
    other = "".join(chr(0x6000 + (i * 11) % 700) for i in range(400))
    docs = spark.createDataFrame(
        [("u1", base), ("u2", near), ("u3", other)], "url string, text string"
    ).localCheckpoint()
    cfg = SigConfig(num_perms=128, lsh_bands=64, seed=42, shingle_k=5)

    groups_char = api.search(docs, tolerance=0.100, cfg=cfg, grouping="cc", unit="char")
    got = {r["id"] for r in groups_char.collect()}
    assert got == {"u1", "u2"}

    groups_tok = api.search(docs, tolerance=0.100, cfg=cfg, grouping="cc")
    assert groups_tok.count() == 0  # token path blind on spaceless text


def test_job_cli_signature_unit_char(spark, tmp_path):
    """--signature-unit char: the persistent pipeline (checkpointed
    signature store + CC) clusters an unsegmented corpus end to end; a
    unit flip against the same checkpoint refuses (fingerprint)."""
    import pytest

    from vid_dup_finder_lib_spark.plans import job

    base = "".join(chr(0x4E00 + (i * 53) % 900) for i in range(400))
    near = base[:200] + "仡仢代" + base[203:]
    other = "".join(chr(0x6000 + (i * 11) % 700) for i in range(400))
    import datetime as dt

    ts = dt.datetime(2025, 1, 1)
    docs = spark.createDataFrame(
        [("u1", ts, base), ("u2", ts, near), ("u3", ts, other)],
        "url string, warc_ts timestamp, text string",
    )
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    ck = str(tmp_path / "ckpt")
    out = str(tmp_path / "groups")
    rc = job.main(
        ["--docs", docs_path, "--checkpoint", ck, "--tolerance", "0.100",
         "--signature-unit", "char", "--output", out]
    )
    assert rc == 0
    groups = spark.read.parquet(out)
    assert {r["id"] for r in groups.collect()} == {"u1", "u2"}

    # unit flip against the cached checkpoint refuses, never mixes
    with pytest.raises(Exception, match="[Ff]ingerprint"):
        job.main(
            ["--docs", docs_path, "--checkpoint", ck, "--tolerance", "0.100",
             "--output", out]
        )

    # fold modes run at char granularity: fold a NEW unsegmented near-dup
    # of u1 (same-position 2-char edit) and it must join u1/u2's cluster
    batch = spark.createDataFrame(
        [("u4", ts, base[:100] + "丏丒" + base[102:])],
        "url string, warc_ts timestamp, text string",
    )
    batch_path = str(tmp_path / "batch")
    batch.write.parquet(batch_path)
    out2 = str(tmp_path / "folded")
    rc = job.main(
        ["--checkpoint", ck, "--signature-unit", "char", "--tolerance",
         "0.100", "--incremental-add", batch_path, "--output", out2]
    )
    assert rc == 0
    folded = {r["id"]: r["cluster_id"] for r in spark.read.parquet(out2).collect()}
    assert folded["u4"] == folded["u1"] == folded["u2"]

    # a TOKEN-unit fold against the char checkpoint still refuses
    # (store fingerprint carries signature_unit)
    with pytest.raises(Exception, match="[Ff]ingerprint"):
        job.main(
            ["--checkpoint", ck, "--tolerance", "0.100",
             "--incremental-add", batch_path, "--output", out2]
        )
