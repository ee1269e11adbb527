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
    # and the mega-cluster's pairs are consequently absent, not silently
    # half-present
    ids = {r.id1 for r in pairs.collect()} | {r.id2 for r in pairs.collect()}
    assert not any("site00000" in i for i in ids)
