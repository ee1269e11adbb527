"""Winnowed-substring fixture oracle: the committed fixture must equal a
fresh regeneration from the Spark-free naive reimplementation AND the
actual Spark query output (the same closure pattern as the simhash
fixture — hash-order-dependent results get independent-reimplementation
oracles, never rows-only checks)."""

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def test_fixture_not_stale():
    from tools.make_winnow_fixture import expected_pairs

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/substring_winnow_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_winnow_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_pairs(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_spark_matches_independent_reimplementation(spark):
    import __spark_entry__ as entry
    from tools.make_winnow_fixture import expected_pairs

    got = {
        (r.id1, r.id2): r.shared_windows
        for r in entry.q_substring_winnowed_pairs(spark, SF_SMALL).collect()
    }
    exp = {
        (int(r.id1), int(r.id2)): int(r.shared_windows)
        for r in expected_pairs(SF_SMALL).itertuples(index=False)
    }
    assert got == exp
    assert len(exp) > 0
