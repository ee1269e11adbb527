"""Hot-bucket salting: the salted triangle block-pairing must produce
exactly the same candidate pair set as the plain bucket self-join, while the
hard cap quarantines (and reports) pathological buckets."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
from vid_dup_finder_lib_spark.operators.signatures import build_signatures


def _sigs(spark, cfg):
    cb = CorpusBuilder(seed=81)
    # one mega-cluster of 40 exact dups -> its band buckets have 40 members
    cb.make_clusters(num_clusters=1, first_size=40, size_step=0, intra_d=0, inter_d=0, doclen=300)
    cb.add_singletons(20, 200, 400, site=9)
    docs = cb.to_spark(spark).localCheckpoint()
    return build_signatures(docs, cfg).localCheckpoint(eager=True)


def test_salted_pairs_equal_plain(spark):
    loose = SigConfig(num_perms=128, lsh_bands=32, seed=42, max_bucket_size=50_000)
    tight = SigConfig(num_perms=128, lsh_bands=32, seed=42, max_bucket_size=8)
    sigs = _sigs(spark, loose)

    plain, q_plain = candidate_pairs(sigs, loose)
    salted, q_salt = candidate_pairs(sigs, tight, salt_groups=4)
    assert q_plain.count() == 0
    assert q_salt.count() == 0  # 40 <= 8 * 4^2, so salted not quarantined

    p = {(r.id1, r.id2) for r in plain.collect()}
    s = {(r.id1, r.id2) for r in salted.collect()}
    assert p == s
    assert len(p) >= 40 * 39 // 2  # the mega-cluster's pairs are all there


def test_hard_cap_quarantines_and_reports(spark):
    tiny = SigConfig(num_perms=128, lsh_bands=32, seed=42, max_bucket_size=2)
    sigs = _sigs(spark, tiny)
    pairs, quarantined = candidate_pairs(sigs, tiny, salt_groups=2)
    # 40-member buckets exceed 2 * 2^2 = 8 -> quarantined, visibly
    q = quarantined.collect()
    assert len(q) > 0
    assert all(r.bucket_size == 40 for r in q)
    assert all(r.policy == "dropped" for r in q)
    # and the mega-cluster's pairs are consequently absent, not silently
    # half-present
    ids = {r.id1 for r in pairs.collect()} | {r.id2 for r in pairs.collect()}
    assert not any("site00000" in i for i in ids)


def test_overcap_sample_recovers_pairs_in_quarantined_buckets(spark):
    """VERDICT r1 item 9: with overcap='sample', planted dups inside an
    over-hard-cap bucket are still found (bounded, reported recall trade)
    instead of vanishing with the bucket."""
    tiny = SigConfig(num_perms=128, lsh_bands=32, seed=42, max_bucket_size=8)
    sigs = _sigs(spark, tiny)  # 40-member mega-cluster buckets > 8*1^2
    dropped, q_drop = candidate_pairs(sigs, tiny, salt_groups=1)
    sampled, q_samp = candidate_pairs(sigs, tiny, salt_groups=1, overcap="sample")

    assert q_drop.count() > 0 and {r.policy for r in q_drop.collect()} == {"dropped"}
    assert {r.policy for r in q_samp.collect()} == {"sampled"}

    cluster = lambda s: {p for p in s if "site00000" in p[0] and "site00000" in p[1]}  # noqa: E731
    drop_pairs = cluster({(r.id1, r.id2) for r in dropped.collect()})
    samp_pairs = cluster({(r.id1, r.id2) for r in sampled.collect()})
    # default loses the whole mega-cluster; sampling recovers a large,
    # deterministic share of its pairs (sample ~8/40 per band, 32 bands —
    # identical docs share every band, so pair recall is high)
    assert len(drop_pairs) == 0
    total = 40 * 39 // 2
    assert len(samp_pairs) >= total // 2
    # every recovered pair is a true member pair (no cross contamination)
    assert all("singleton" not in a and "singleton" not in b for a, b in samp_pairs)


def test_min_band_collisions_keeps_true_pairs_drops_noise(spark):
    """c >= 2: a true dup cluster collides in many bands (E = b*J^r >> c),
    so its pairs all survive; pairs that collide in exactly one band are
    dropped.  Invariant: filtered candidates are a subset of c=1
    candidates, and every pair with J >= 1/2 (the verify threshold the
    char queries use) is retained."""
    base = SigConfig(num_perms=128, lsh_bands=64, seed=42)
    filt = SigConfig(num_perms=128, lsh_bands=64, seed=42, min_band_collisions=3)
    sigs = _sigs(spark, base)

    all_pairs, _ = candidate_pairs(sigs, base)
    kept, _ = candidate_pairs(sigs, filt)
    a = {(r.id1, r.id2) for r in all_pairs.collect()}
    k = {(r.id1, r.id2) for r in kept.collect()}
    assert k <= a
    # the 40-member exact-dup cluster: identical minhash -> collides in all
    # 64 bands -> every one of its 780 pairs survives c=3
    cluster_pairs = {p for p in a if "/0000/" in p[0] and "/0000/" in p[1]}
    assert len(cluster_pairs) == 40 * 39 // 2
    assert cluster_pairs <= k


def test_min_band_collisions_validated():
    import pytest

    with pytest.raises(ValueError, match="min_band_collisions"):
        SigConfig(min_band_collisions=0)


def test_min_band_collisions_in_fingerprint():
    a = SigConfig()
    b = SigConfig(min_band_collisions=3)
    assert a.fingerprint() != b.fingerprint()
