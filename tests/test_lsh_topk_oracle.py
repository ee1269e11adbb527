"""Hyperplane-LSH top-k fixture oracle: the committed fixture must equal a
fresh regeneration from the Spark-free naive reimplementation AND the
actual Spark query output (the same closure pattern as the simhash and
winnowed-substring fixtures — engine-constant-dependent results get
independent-reimplementation oracles, never rows-only checks)."""

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def test_fixture_not_stale():
    from tools.make_lsh_topk_fixture import expected_topk

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/lsh_topk_{name}.parquet"
        assert os.path.exists(path), f"fixture missing: {path} (run tools/make_lsh_topk_fixture.py)"
        committed = pd.read_parquet(path)
        fresh = expected_topk(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_spark_matches_independent_reimplementation(spark):
    import __spark_entry__ as entry
    from tools.make_lsh_topk_fixture import expected_topk

    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in entry.q_lsh_bucket_topk(spark, SF_SMALL).collect()
    }
    exp = {
        (int(r.query_id), int(r.rank)): int(r.neighbor_id)
        for r in expected_topk(SF_SMALL).itertuples(index=False)
    }
    assert got == exp
    assert len(exp) > 0
