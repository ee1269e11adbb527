"""plan_lsh_bands: the pure-math banding planner (RECALL.md's measured
sweep, closed-form)."""

import pytest

from vid_dup_finder_lib_spark.config import SigConfig, plan_lsh_bands


def _recall(b, r, j):
    return 1.0 - (1.0 - j**r) ** b


def test_reproduces_the_library_geometries():
    # the oracle-gate geometry: J=0.4 verify threshold -> 64 bands x 2 rows
    assert plan_lsh_bands(0.4, 0.99, 128) == (64, 2)
    # the default-config regime: J~0.65-0.7 -> 32 bands x 4 rows
    assert plan_lsh_bands(0.7, 0.99, 128) == (32, 4)


def test_picks_largest_safe_rows():
    for j in (0.2, 0.35, 0.5, 0.8, 0.95):
        b, r = plan_lsh_bands(j, 0.99, 128)
        assert b * r == 128
        assert _recall(b, r, j) >= 0.99
        # the next-coarser divisor geometry must MISS the floor (else the
        # planner left cost on the table)
        nxt = next(
            (rr for rr in range(r + 1, 129) if 128 % rr == 0), None
        )
        if nxt is not None:
            assert _recall(128 // nxt, nxt, j) < 0.99


def test_monotone_in_threshold():
    rows = [plan_lsh_bands(j, 0.99, 128)[1] for j in (0.1, 0.3, 0.5, 0.7, 0.9)]
    assert rows == sorted(rows)  # higher threshold -> coarser (cheaper) bands


def test_unreachable_floor_raises():
    with pytest.raises(ValueError, match="raise num_perms"):
        plan_lsh_bands(0.01, 0.999, 128)
    with pytest.raises(ValueError, match="j_threshold"):
        plan_lsh_bands(0.0)
    with pytest.raises(ValueError, match="min_recall"):
        plan_lsh_bands(0.5, 1.0)


def test_for_threshold_builds_valid_config():
    cfg = SigConfig.for_threshold(0.4)
    assert (cfg.lsh_bands, cfg.rows_per_band) == (64, 2)
    cfg2 = SigConfig.for_threshold(0.7, seed=7)
    assert (cfg2.lsh_bands, cfg2.rows_per_band) == (32, 4)
    assert cfg2.seed == 7
    # fingerprint reflects the planned geometry
    assert cfg.fingerprint() != cfg2.fingerprint()
