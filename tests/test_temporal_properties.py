"""Property tests: temporal operators vs independent public oracles.

asof_join is checked against pandas.merge_asof (direction='backward',
inclusive — the published reference semantics it claims); sessionize and
range_join against naive Python folds.  Random inputs via hypothesis keep
the Spark run count modest (deadline disabled — JVM latency).
"""

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from vid_dup_finder_lib_spark.operators.temporal import asof_join, range_join, sessionize

BASE = dt.datetime(2024, 1, 1)


def _t(minutes):
    return BASE + dt.timedelta(minutes=int(minutes))


rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)),  # (key, minute)
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(left_rows=rows_strategy, right_rows=rows_strategy)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # unique (key, ts) per side: the documented determinism precondition
    left_rows = sorted({(k, m) for k, m in left_rows})
    right_rows = sorted({(k, m) for k, m in right_rows})
    left = [(i, k, _t(m)) for i, (k, m) in enumerate(left_rows)]
    right = [(1000 + i, k, _t(m)) for i, (k, m) in enumerate(right_rows)]

    ldf = spark.createDataFrame(left, "lid: long, k: long, ts: timestamp") if left else \
        spark.createDataFrame([], "lid: long, k: long, ts: timestamp")
    rdf = spark.createDataFrame(right, "rid: long, k: long, ts: timestamp") if right else \
        spark.createDataFrame([], "rid: long, k: long, ts: timestamp")
    got = {r.lid: r.r_rid for r in asof_join(ldf, rdf, on="k").collect()}

    lp = pd.DataFrame(left, columns=["lid", "k", "ts"])
    rp = pd.DataFrame(right, columns=["rid", "k", "ts"])
    if len(lp) == 0:
        assert got == {}
        return
    if len(rp) == 0:
        assert got == {r[0]: None for r in left}
        return
    merged = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    )
    exp = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples(index=False)
    }
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(rows=rows_strategy, gap=st.integers(1, 120))
def test_sessionize_matches_naive_fold(spark, rows, gap):
    rows = sorted({(k, m) for k, m in rows})
    data = [(i, k, _t(m)) for i, (k, m) in enumerate(rows)]
    if not data:
        return
    df = spark.createDataFrame(data, "event_id: long, user_id: long, ts: timestamp")
    got = {r.event_id: r.session_idx for r in sessionize(df, gap_seconds=gap * 60).collect()}

    exp = {}
    bykey = {}
    for eid, k, ts in sorted(data, key=lambda r: (r[1], r[2], r[0])):
        last, idx = bykey.get(k, (None, -1))
        if last is None or (ts - last).total_seconds() > gap * 60:
            idx += 1
        bykey[k] = (ts, idx)
        exp[eid] = idx
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(
    points=rows_strategy,
    intervals=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 90)),
        min_size=0,
        max_size=15,
    ),
    bucket_minutes=st.sampled_from([1, 7, 60, 240]),
)
def test_range_join_matches_naive_filter(spark, points, intervals, bucket_minutes):
    points = sorted({(k, m) for k, m in points})
    left = [(i, k, _t(m)) for i, (k, m) in enumerate(points)]
    right = [
        (1000 + i, k, _t(s), _t(s + d)) for i, (k, s, d) in enumerate(intervals)
    ]
    if not left or not right:
        return
    ldf = spark.createDataFrame(left, "lid: long, k: long, ts: timestamp")
    rdf = spark.createDataFrame(right, "rid: long, k: long, s: timestamp, e: timestamp")
    got = sorted(
        (r.lid, r.r_rid)
        for r in range_join(
            ldf, rdf, on="k", left_point="ts", right_start="s", right_end="e",
            bucket_width_us=bucket_minutes * 60_000_000,
        ).collect()
    )
    exp = sorted(
        (lid, rid)
        for lid, lk, ts in left
        for rid, rk, s, e in right
        if lk == rk and s <= ts <= e
    )
    assert got == exp
