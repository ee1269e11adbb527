"""Temporal operators: as-of join, sessionization, tumbling rollup.

Edge cases the oracle queries can't isolate: no-prior-match nulls, inclusive
tie semantics, tolerance cutoff, single-event sessions, decimal exactness.
"""

import datetime as dt

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.temporal import (
    asof_join,
    epoch_us,
    sessionize,
    window_rollup,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive_and_nulls(spark):
    left = _mk(
        spark,
        [
            (1, 10, _ts("2024-01-01T10:00:00")),   # before any right row
            (2, 10, _ts("2024-01-01T12:00:00")),   # exactly at a right ts -> inclusive
            (3, 10, _ts("2024-01-01T13:30:00")),   # between right rows
            (4, 99, _ts("2024-01-01T13:30:00")),   # key with no right rows at all
        ],
        "lid: long, user_id: long, ts: timestamp",
    )
    right = _mk(
        spark,
        [
            (100, 10, _ts("2024-01-01T12:00:00")),
            (101, 10, _ts("2024-01-01T13:00:00")),
            (102, 10, _ts("2024-01-01T14:00:00")),
        ],
        "rid: long, user_id: long, ts: timestamp",
    )
    got = {
        r.lid: r.r_rid
        for r in asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts").collect()
    }
    assert got == {1: None, 2: 100, 3: 101, 4: None}


def test_asof_tolerance(spark):
    left = _mk(
        spark,
        [(1, 7, _ts("2024-01-01T10:00:10"))],
        "lid: long, k: long, ts: timestamp",
    )
    right = _mk(
        spark,
        [(50, 7, _ts("2024-01-01T10:00:00"))],
        "rid: long, k: long, ts: timestamp",
    )
    within = asof_join(left, right, on="k", tolerance_us=10_000_000).collect()[0]
    beyond = asof_join(left, right, on="k", tolerance_us=9_999_999).collect()[0]
    assert within.r_rid == 50
    assert beyond.r_rid is None


def test_asof_empty_sides(spark):
    empty = spark.createDataFrame([], "lid: long, k: long, ts: timestamp")
    right = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T00:00:00"))], "rid: long, k: long, ts: timestamp"
    )
    assert asof_join(empty, right, on="k").count() == 0
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T00:00:00"))], "lid: long, k: long, ts: timestamp"
    )
    no_right = spark.createDataFrame([], "rid: long, k: long, ts: timestamp")
    rows = asof_join(left, no_right, on="k").collect()
    assert len(rows) == 1 and rows[0].r_rid is None


def test_sessionize_gaps_and_singletons(spark):
    ev = _mk(
        spark,
        [
            (1, 5, _ts("2024-01-01T00:00:00")),
            (2, 5, _ts("2024-01-01T00:10:00")),   # 10 min -> same session
            (3, 5, _ts("2024-01-01T01:00:01")),   # 50:01 gap > 30 min -> new
            (4, 6, _ts("2024-01-01T00:00:00")),   # other user: own session 0
        ],
        "event_id: long, user_id: long, ts: timestamp",
    )
    s = sessionize(ev, gap_seconds=1800)
    got = {r.event_id: r.session_idx for r in s.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_sessionize_boundary_exact_gap_not_new(spark):
    # gap exactly == gap_seconds is NOT a new session (strict >)
    ev = _mk(
        spark,
        [
            (1, 5, _ts("2024-01-01T00:00:00")),
            (2, 5, _ts("2024-01-01T00:30:00")),
        ],
        "event_id: long, user_id: long, ts: timestamp",
    )
    got = {r.event_id: r.session_idx for r in sessionize(ev, gap_seconds=1800).collect()}
    assert got == {1: 0, 2: 0}


def test_window_rollup_decimal_exact(spark):
    ev = _mk(
        spark,
        [
            (1, "a", _ts("2024-01-01T10:15:00"), 0.1),
            (2, "a", _ts("2024-01-01T10:45:00"), 0.2),
            (3, "a", _ts("2024-01-01T11:05:00"), 0.7),
        ],
        "event_id: long, event_type: string, ts: timestamp, value: double",
    )
    rows = {
        r.window_start_us: (r.n_events, str(r.value_sum))
        for r in window_rollup(ev, width="hour", group_cols=("event_type",)).collect()
    }
    h10 = int(_ts("2024-01-01T10:00:00").replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    h11 = int(_ts("2024-01-01T11:00:00").replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    # 0.1 + 0.2 is NOT 0.3 in doubles; it IS in decimal
    assert rows[h10] == (2, "0.30")
    assert rows[h11] == (1, "0.70")


def test_epoch_us_ntz_matches_utc(spark):
    df = spark.createDataFrame([(_ts("2024-01-01T00:00:01"),)], "ts: timestamp_ntz")
    val = df.select(epoch_us("ts").alias("us")).collect()[0].us
    assert val == 1_704_067_201_000_000


def test_range_join_buckets_and_boundaries(spark):
    from vid_dup_finder_lib_spark.operators.temporal import range_join

    left = _mk(
        spark,
        [
            (1, 7, _ts("2024-01-01T10:00:00")),  # exactly at interval start
            (2, 7, _ts("2024-01-01T11:00:00")),  # exactly at interval end
            (3, 7, _ts("2024-01-01T11:00:01")),  # just past the end
            (4, 7, _ts("2024-01-01T10:30:00")),  # inside
            (5, 8, _ts("2024-01-01T10:30:00")),  # other key: no interval
        ],
        "lid: long, k: long, ts: timestamp",
    )
    right = _mk(
        spark,
        [(100, 7, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "rid: long, k: long, s: timestamp, e: timestamp",
    )
    # tiny bucket (1 min) forces the interval across 61 buckets; each
    # matching pair must still appear EXACTLY once (no distinct in the op)
    rows = range_join(
        left, right, on="k", left_point="ts", right_start="s", right_end="e",
        bucket_width_us=60_000_000,
    ).collect()
    got = sorted((r.lid, r.r_rid) for r in rows)
    assert got == [(1, 100), (2, 100), (4, 100)]


def test_range_join_overlapping_intervals(spark):
    from vid_dup_finder_lib_spark.operators.temporal import range_join

    left = _mk(spark, [(1, 7, _ts("2024-01-01T10:30:00"))], "lid: long, k: long, ts: timestamp")
    right = _mk(
        spark,
        [
            (100, 7, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00")),
            (101, 7, _ts("2024-01-01T10:15:00"), _ts("2024-01-01T10:45:00")),
            (102, 7, _ts("2024-01-01T10:31:00"), _ts("2024-01-01T12:00:00")),
        ],
        "rid: long, k: long, s: timestamp, e: timestamp",
    )
    rows = range_join(
        left, right, on="k", left_point="ts", right_start="s", right_end="e"
    ).collect()
    assert sorted(r.r_rid for r in rows) == [100, 101]


def test_range_join_explosion_guard_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from vid_dup_finder_lib_spark.operators.temporal import range_join

    import pytest

    left = _mk(spark, [(1, 7, _ts("2024-01-01T10:30:00"))], "lid: long, k: long, ts: timestamp")
    # a 1-year interval at 1-second buckets: ~31.5M buckets >> the cap
    right = _mk(
        spark,
        [(100, 7, _ts("2024-01-01T00:00:00"), _ts("2025-01-01T00:00:00"))],
        "rid: long, k: long, s: timestamp, e: timestamp",
    )
    with pytest.raises(Exception) as ei:
        range_join(
            left, right, on="k", left_point="ts", right_start="s", right_end="e",
            bucket_width_us=1_000_000,
        ).count()
    assert "range_join" in str(ei.value)


def test_range_join_inverted_interval_raises(spark):
    """An inverted interval (end < start, e.g. a zero/sentinel end) must
    RAISE, not silently explode: sequence(start, stop) with start > stop
    steps -1, so one bad row would generate a huge descending bucket list
    the residual filter then discards — hidden cost the valve must catch
    (round-3 advice: n_buckets <= 0 bypassed the cap guard)."""
    from vid_dup_finder_lib_spark.operators.temporal import range_join

    import pytest

    left = _mk(spark, [(1, 7, _ts("2024-01-01T10:30:00"))], "lid: long, k: long, ts: timestamp")
    # sentinel epoch-zero end under a 2024 start: inverted
    right = _mk(
        spark,
        [(100, 7, _ts("2024-01-01T00:00:00"), _ts("1970-01-01T00:00:00"))],
        "rid: long, k: long, s: timestamp, e: timestamp",
    )
    with pytest.raises(Exception) as ei:
        range_join(
            left, right, on="k", left_point="ts", right_start="s", right_end="e"
        ).count()
    assert "inverted interval" in str(ei.value)


def test_asof_null_timestamps_never_match(spark):
    # a null-ts right row must not be carried into matches (Spark asc sort
    # is NULLS FIRST — it would sort to the partition head); a null-ts left
    # row keeps null match columns
    left = _mk(
        spark,
        [(1, 7, _ts("2024-01-01T10:00:00")), (2, 7, None)],
        "lid: long, k: long, ts: timestamp",
    )
    right = _mk(
        spark,
        [(50, 7, None), (51, 7, _ts("2024-01-01T09:00:00"))],
        "rid: long, k: long, ts: timestamp",
    )
    got = {r.lid: r.r_rid for r in asof_join(left, right, on="k").collect()}
    assert got == {1: 51, 2: None}
