"""Boilerplate strip (P3/P4 letterbox-crop analog).

Mirrors the reference's crop tests on hand-drawn pixel grids
(``video_frames_gray.rs:216-459``) with hand-built line layouts, plus the
round-2 requirement: planted near-dups hidden behind corpus-wide boilerplate
are recovered once the strip runs (the mega-bucket quarantine story fixed at
the source).
"""

import pyspark.sql.functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.operators.boilerplate import strip_boilerplate
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.operators.verify import verified_edges


def test_strip_semantics(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "HEADER\nunique one\nMIDBP\nunique two\nFOOTER"),
            ("d2", "HEADER\nother text\nMIDBP\nmore text\nFOOTER"),
            ("d3", "HEADER\nFOOTER"),
            ("d4", "solo first line\nMIDBP\nsolo last line"),
            ("d5", None),
        ],
        "url string, text string",
    )
    # df over 5 docs at threshold 1/2: HEADER df=3, FOOTER df=3, MIDBP df=3
    out = {
        r.id: r
        for r in strip_boilerplate(docs, 1, 2).collect()
    }
    # edges stripped, interior boilerplate KEPT (crop semantics)
    assert out["d1"].text_stripped == "unique one\nMIDBP\nunique two"
    assert (out["d1"].n_stripped_leading, out["d1"].n_stripped_trailing) == (1, 1)
    assert out["d2"].text_stripped == "other text\nMIDBP\nmore text"
    # all-boilerplate doc strips to empty (NotEnoughTokens downstream)
    assert out["d3"].text_stripped == ""
    assert (out["d3"].n_stripped_leading, out["d3"].n_stripped_trailing) == (2, 0)
    # no boilerplate at the edges: unchanged even though MIDBP is interior
    assert out["d4"].text_stripped == "solo first line\nMIDBP\nsolo last line"
    assert (out["d4"].n_stripped_leading, out["d4"].n_stripped_trailing) == (0, 0)
    # null text passes through as null
    assert out["d5"].text_stripped is None


def _recall(spark, docs, cfg, planted, strip):
    if strip:
        docs = strip_boilerplate(docs, 1, 2).select(
            F.col("id").alias("url"), F.col("text_stripped").alias("text")
        )
    sigs = build_signatures(docs, cfg).localCheckpoint(eager=True)
    # salt_groups=1: buckets beyond max_bucket_size go straight to quarantine
    pairs, quarantined = candidate_pairs(sigs, cfg, salt_groups=1)
    edges = verified_edges(
        pairs, sigs, cfg, jaccard_num_den=(2, 5), length_band=False
    )
    found = {(r.id1, r.id2) for r in edges.select("id1", "id2").collect()}
    hits = sum(1 for p in planted if p in found)
    return hits / len(planted), quarantined.count()


def test_recall_improves_after_strip(spark):
    """60 docs sharing 30 boilerplate lines + unique 3-line tails; docs
    (2i, 2i+1) have identical tails — 30 planted dup pairs.  Boilerplate
    collapses every LSH band into one 60-member bucket, which quarantines at
    max_bucket_size=8; the strip recovers full recall."""
    # 400 lines x 8 tokens = ~3200 boilerplate shingles vs ~4 tail shingles
    # per doc: the chance a band's two minhash perms both hit boilerplate is
    # (1 - 4/3200)^2 per perm-pair, so most planted pairs have ALL their
    # matching bands inside the quarantined 60-member buckets
    bp_block = "\n".join(
        f"boilerplate nav line number {j} shared by absolutely every page here"
        for j in range(400)
    )
    rows = []
    for i in range(60):
        # tail tokens are all pair-specific so post-strip shingle sets are
        # disjoint across pairs (no accidental cross-pair near-dups)
        tail = " ".join(f"art{i // 2}tok{j}" for j in range(8))
        rows.append((f"doc{i:03d}", bp_block + "\n" + tail))
    docs = spark.createDataFrame(rows, "url string, text string")
    planted = [(f"doc{2*i:03d}", f"doc{2*i+1:03d}") for i in range(30)]
    cfg = SigConfig(num_perms=128, lsh_bands=64, max_bucket_size=8)

    recall_before, quarantined_before = _recall(spark, docs, cfg, planted, strip=False)
    recall_after, quarantined_after = _recall(spark, docs, cfg, planted, strip=True)

    # before: the shared block dominates the minhash — buckets quarantine
    assert quarantined_before > 0
    assert recall_before < 1.0
    # after: boilerplate gone, every planted pair found, nothing quarantined
    assert quarantined_after == 0
    assert recall_after == 1.0
    assert recall_after > recall_before
