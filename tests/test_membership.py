"""Bloom membership prefilter: the guarantees the oracle gate can't see —
no false negatives ever, bitmap identical under any partitioning, the
prefilter actually prunes the verify join, and the fail-fast valves."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.membership import (
    _probe_positions,
    bloom_build,
    bloom_candidates,
    bloom_m_bits,
    bloom_optimal_k,
    incremental_exact_dedup,
)

M_BITS = 1 << 12
K = 5


@pytest.fixture(scope="module")
def keyed(spark):
    # int64 keys with negative values in the mix (sign handling matters:
    # positions derive from the uint64 view, not python int semantics)
    vals = [(i * 2_654_435_761 - (1 << 40),) for i in range(2000)]
    return spark.createDataFrame(vals, "key long")


def test_bitmap_partitioning_invariance(spark, keyed):
    a = bloom_build(keyed.repartition(1), "key", M_BITS, K)
    b = bloom_build(keyed.repartition(16), "key", M_BITS, K)
    assert a.dtype == np.uint64 and len(a) == M_BITS // 64
    assert np.array_equal(a, b)


def test_no_false_negatives(spark, keyed):
    words = bloom_build(keyed, "key", M_BITS, K)
    hit = bloom_candidates(keyed, "key", words, M_BITS, K)
    assert hit.where(~F.col("bloom_hit")).count() == 0


def test_prefilter_prunes_nonmembers(spark, keyed):
    # disjoint probe set: at m/n = 2 bits/key fpr is high but must be < 1;
    # with a realistically sized filter it collapses to near zero
    words = bloom_build(keyed, "key", M_BITS, K)
    other = spark.createDataFrame(
        [(i * 7_919 + 3,) for i in range(2000)], "key long"
    )
    tight = bloom_candidates(other, "key", words, M_BITS, K).where(
        F.col("bloom_hit")
    ).count()
    assert tight < 2000
    big = bloom_m_bits(2000, 0.01)
    words2 = bloom_build(keyed, "key", big, bloom_optimal_k(big, 2000))
    loose = bloom_candidates(
        other, "key", words2, big, bloom_optimal_k(big, 2000)
    ).where(F.col("bloom_hit")).count()
    assert loose <= 2000 * 0.05  # ~1 % nominal, 5x headroom


def test_probe_positions_frozen():
    # the determinism contract: reimplementable without Spark — pin a few
    # values so an accidental constant/formula change cannot slip through
    pos = _probe_positions(np.array([0, 1, -1], dtype=np.int64), 1 << 16, 3)
    ref = []
    for x in [0, 1, (1 << 64) - 1]:
        def sm64(v):
            z = (v + 0x9E3779B97F4A7C15) % (1 << 64)
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
            return z ^ (z >> 31)
        h1 = sm64(x)
        h2 = sm64(x ^ 0x9E3779B97F4A7C15) | 1
        ref.append([(h1 + i * h2) % (1 << 16) for i in range(3)])
    assert pos.tolist() == ref


def test_build_valves(spark, keyed):
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(keyed, "key", 100, K)
    with pytest.raises(TypeError, match="int64 key"):
        bloom_build(keyed.select(F.col("key").cast("string")), "key", M_BITS, K)
    nullable = spark.createDataFrame([(1,), (None,)], "key long")
    with pytest.raises(Exception, match="null membership key"):
        bloom_build(nullable, "key", M_BITS, K)


def test_incremental_exact_dedup_end_to_end(spark):
    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} body") for i in range(100)],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        # 50 true dups (verbatim copies), 50 fresh
        [(1000 + i, f"corpus document number {i} body") for i in range(50)]
        + [(2000 + i, f"brand new page {i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["is_dup"]
        for r in incremental_exact_dedup(
            incoming, corpus, m_bits=1 << 12, k=5
        ).collect()
    }
    assert len(out) == 100
    assert all(out[1000 + i] for i in range(50))
    assert not any(out[2000 + i] for i in range(50))


def test_join_probe_equals_broadcast_probe(spark, keyed):
    """The distributed register-table probe must agree bit-for-bit with the
    dense broadcast probe — members AND non-members (the positions come
    from the same frozen kernel, so any disagreement is a join-plan bug)."""
    from vid_dup_finder_lib_spark.operators.membership import (
        bloom_candidates_join,
        bloom_words,
    )

    ids = keyed.withColumn("rid", F.monotonically_increasing_id()).localCheckpoint()
    other = spark.createDataFrame(
        [(10_000 + i, i * 7_919 + 3) for i in range(2000)], "rid long, key long"
    )
    probe_set = ids.select("rid", "key").unionByName(other).localCheckpoint()
    dense = bloom_build(keyed, "key", M_BITS, K)
    words = bloom_words(keyed, "key", M_BITS, K)
    a = {
        r["rid"]: r["bloom_hit"]
        for r in bloom_candidates(probe_set, "key", dense, M_BITS, K).collect()
    }
    b = {
        r["rid"]: r["bloom_hit"]
        for r in bloom_candidates_join(
            probe_set, "key", words, M_BITS, K, id_col="rid"
        ).collect()
    }
    assert a == b and len(a) == 4000


def test_join_probe_at_driver_hostile_m_bits(spark):
    """m_bits = 2^40 (128 GiB dense — impossible on any driver) must work
    on the register-table path: the sparse table holds only O(n*k) words
    and the probe never materializes anything O(m_bits)."""
    from vid_dup_finder_lib_spark.operators.membership import (
        bloom_candidates_join,
        bloom_words,
    )

    m = 1 << 40
    corpus = spark.createDataFrame(
        [(i, i * 2_654_435_761 - (1 << 40)) for i in range(500)], "rid long, key long"
    ).localCheckpoint()
    words = bloom_words(corpus, "key", m, K)
    assert words.count() <= 500 * K  # sparse: at most n*k set words
    hits = bloom_candidates_join(corpus, "key", words, m, K, id_col="rid")
    assert hits.where(~F.col("bloom_hit")).count() == 0  # no false negatives
    # at 2^40 bits / 500 keys the fpr is ~0: a disjoint probe set misses
    other = spark.createDataFrame(
        [(10_000 + i, i * 7_919 + 3) for i in range(500)], "rid long, key long"
    )
    assert (
        bloom_candidates_join(other, "key", words, m, K, id_col="rid")
        .where(F.col("bloom_hit"))
        .count()
        == 0
    )


def test_bloom_build_refuses_driver_scale(spark, keyed):
    with pytest.raises(ValueError, match="distributed register-table"):
        bloom_build(keyed, "key", 1 << 40, K)


def test_incremental_dedup_join_mode_identical(spark):
    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} body") for i in range(100)],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(1000 + i, f"corpus document number {i} body") for i in range(50)]
        + [(2000 + i, f"brand new page {i}") for i in range(50)],
        "doc_id long, text string",
    )
    a = {
        r["doc_id"]: r["is_dup"]
        for r in incremental_exact_dedup(
            incoming, corpus, m_bits=1 << 12, k=5, mode="broadcast"
        ).collect()
    }
    b = {
        r["doc_id"]: r["is_dup"]
        for r in incremental_exact_dedup(
            incoming, corpus, m_bits=1 << 12, k=5, mode="join"
        ).collect()
    }
    assert a == b and len(a) == 100
