"""Integer-ppm exactness at the decimal HALF_UP boundary.

Every ppm column in the engine must be computed with SQL ``div`` (exact
integral division, matching DuckDB ``//``), never ``floor(decimal /)``:
Spark's decimal division adjusts the result to scale 6 and rounds HALF_UP
*before* any ``floor`` sees the value, so a true ratio whose fractional
part lands within 5e-7 of 1 floors one ppm high.  clustering_agreement was
the round-4 driver-red instance (tests/test_cluster_reports.py pins it);
these tests pin the same boundary for the other ppm emitters —
``shingle_novelty_scores`` and ``source_dedup_ledger``.

Boundary construction (shared): ratio = 2 / 2_000_001.  In ppm that is
2_000_000 / 2_000_001 = 0.9999995000...  — fractional part exactly at the
HALF_UP threshold, so decimal(38,6) division reports 1.000000 and a
subsequent floor says 1 ppm; true integer division says 0.
"""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.dedup import (
    shingle_novelty_scores,
    source_dedup_ledger,
)

SC = 2_000_001  # denominator: forces the 0.9999995 fractional part


def test_novelty_ppm_floor_is_exact_near_one(spark):
    """Doc X holds SC distinct shingles, SC-2 of them shared with doc Y:
    unique = 2, so novelty = 2e6/SC ppm = 0.9999995 ppm — `div` must say 0,
    the decimal `/` + floor path would say 1."""
    shared = list(range(SC - 2))
    x_hashes = shared + [10_000_000, 10_000_001]
    sigs = spark.createDataFrame(
        [(1, len(x_hashes), x_hashes), (2, len(shared), shared)],
        "id long, shingle_count long, shingle_hashes array<long>",
    )
    got = {r["id"]: r for r in shingle_novelty_scores(sigs).collect()}
    assert got[1]["shingle_count"] == SC
    assert got[1]["n_dup_shingles"] == SC - 2
    assert got[1]["novelty_ppm"] == 0  # floor(2e6/2_000_001), NOT 1
    assert got[2]["novelty_ppm"] == 0  # every shingle duplicated


def test_ledger_kept_ppm_floor_is_exact_near_one(spark):
    """Source keeps 2 of 2_000_001 tokens: kept_ppm = 2e6/SC = 0.9999995
    ppm — `div` must say 0."""
    big = " ".join(["w"] * (SC - 2))  # SC-2 tokens, duplicated content
    docs = spark.createDataFrame(
        [
            (1, "other", big),  # min-id survivor lives elsewhere
            (2, "s", big),  # dup: all SC-2 tokens lost
            (3, "s", "a b"),  # unique: 2 tokens kept
        ],
        "doc_id long, source string, text string",
    )
    row = {r["source"]: r for r in source_dedup_ledger(docs).collect()}["s"]
    assert row["tokens_total"] == SC
    assert row["tokens_kept"] == 2
    assert row["kept_ppm"] == 0  # floor(2e6/2_000_001), NOT 1
