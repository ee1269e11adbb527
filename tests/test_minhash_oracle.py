"""MinHash calibration fixture oracle: the committed fixture must (a) hold
the frozen perm-family/fold contract against the engine, (b) equal a fresh
Spark-free regeneration, and (c) equal the actual Spark query output —
pinning the estimator the LSH banding (RECALL.md) is built on."""

import os
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"


def test_contract_matches_engine():
    from tools.make_minhash_fixture import _assert_contract_matches_engine

    _assert_contract_matches_engine()


def test_fixture_not_stale():
    from tools.make_minhash_fixture import expected_pairs

    for sf_dir in (SF_SMALL, "/root/testdata/sf0.01"):
        name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        path = f"/root/repo/fixtures/minhash_estimate_{name}.parquet"
        assert os.path.exists(path), (
            f"fixture missing: {path} (run tools/make_minhash_fixture.py)"
        )
        committed = pd.read_parquet(path)
        fresh = expected_pairs(sf_dir)
        pd.testing.assert_frame_equal(committed, fresh)


def test_spark_query_equals_fixture(spark):
    import __spark_entry__ as entry

    got = (
        entry.queries()["minhash_estimate_pairs"](spark, SF_SMALL)
        .toPandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    committed = pd.read_parquet(
        "/root/repo/fixtures/minhash_estimate_sf0.001.parquet"
    )
    pd.testing.assert_frame_equal(
        got.astype(committed.dtypes.to_dict()), committed
    )
    # the estimator is actually calibrated: mean |matches/128 - jaccard|
    # within 5 points over the verified pairs (binomial sd at n=128 ~ 4.4)
    err = (
        got["minhash_matches"] / 128.0
        - got["inter_count"] / got["union_count"]
    ).abs()
    assert err.mean() < 0.05, f"estimator miscalibrated: mean |err| {err.mean():.3f}"
