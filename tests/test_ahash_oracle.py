"""Image aHash Hamming-pairs fixture oracle: the committed fixture must
equal a fresh regeneration from the Spark-free naive reimplementation AND
the actual Spark query output — the perceptual-hash near-dup search on the
reference's own modality (images), closed under the same fixture-oracle
discipline as simhash / winnowing / LSH-topk / IVF."""

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def test_fixture_not_stale():
    from tools.make_ahash_fixture import expected_pairs

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/ahash_pairs_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_ahash_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_pairs(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_spark_matches_independent_reimplementation(spark):
    import __spark_entry__ as entry
    from tools.make_ahash_fixture import COPY_OFFSET, expected_pairs

    got = {
        (r.media_id1, r.media_id2): r.hamming
        for r in entry.q_image_ahash_pairs(spark, SF_SMALL).collect()
    }
    exp = {
        (int(r.media_id1), int(r.media_id2)): int(r.hamming)
        for r in expected_pairs(SF_SMALL).itertuples(index=False)
    }
    assert got == exp
    # the planted base/copy pairs dominate the result (near-dup search
    # finds what was planted, not hash-collision noise)
    planted = sum(1 for (a, b) in exp if b - a == COPY_OFFSET)
    assert planted / len(exp) > 0.9
    assert len(exp) > 100


def test_audio_fixture_not_stale():
    from tools.make_audio_fp_fixture import expected_pairs

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/audio_fp_pairs_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_audio_fp_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_pairs(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_audio_spark_matches_independent_reimplementation(spark):
    import __spark_entry__ as entry
    from tools.make_audio_fp_fixture import COPY_OFFSET, expected_pairs

    got = {
        (r.media_id1, r.media_id2): r.hamming
        for r in entry.q_audio_fp_pairs(spark, SF_SMALL).collect()
    }
    exp = {
        (int(r.media_id1), int(r.media_id2)): int(r.hamming)
        for r in expected_pairs(SF_SMALL).itertuples(index=False)
    }
    assert got == exp
    planted = sum(1 for (a, b) in exp if b - a == COPY_OFFSET)
    assert planted / len(exp) > 0.9
    assert len(exp) > 100
