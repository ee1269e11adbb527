"""SimHash fixture oracle: the committed fixture must (a) equal a fresh
regeneration from the Spark-free reimplementation and (b) equal the actual
Spark query output — closing the one rows-only cell in round-1 CORRECTNESS."""

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def _regen(sf_dir):
    from tools.make_simhash_fixture import expected_pairs

    return expected_pairs(sf_dir)


def test_fixture_is_independent_of_engine_and_contract_holds():
    """The fixture tool hard-codes the frozen constants and reimplements the
    simhash fold from scratch; this asserts the engine still agrees with that
    frozen contract (a drift in either side fails here, not silently)."""
    from tools.make_simhash_fixture import _assert_contract_matches_engine

    _assert_contract_matches_engine()


def test_fixture_not_stale():
    from tools.make_simhash_fixture import expected_pairs

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/simhash_pairs_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_simhash_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_pairs(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_spark_matches_independent_reimplementation(spark):
    import __spark_entry__ as entry

    got = {
        (r.id1, r.id2): r.simhash_hamming
        for r in entry.q_simhash_pairs(spark, SF_SMALL).collect()
    }
    exp = {
        (int(r.id1), int(r.id2)): int(r.simhash_hamming)
        for r in _regen(SF_SMALL).itertuples(index=False)
    }
    assert got == exp
    assert len(exp) > 0
