"""r6 optimization: state-partition sizing for the availableNow streaming
runners (streaming/util.py) — the sized conf must be scoped (restored after
the runner returns), data-derived (bytes -> partitions, capped at the
session width), and must not change emitted results."""

import os


def test_size_state_partitions_rule(spark):
    from vid_dup_finder_lib_spark.streaming.util import size_state_partitions

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # tiny input floors at 8 (or the session cap when smaller)
    assert size_state_partitions(spark, 1024) == min(cap, 8)
    # one partition per 64 MB once past the floor
    assert size_state_partitions(spark, (64 << 20) * 20) == min(cap, 21)
    # never exceeds the session's configured shuffle width
    assert size_state_partitions(spark, 1 << 60) == cap


def test_state_partition_conf_scoped(spark):
    from vid_dup_finder_lib_spark.streaming.util import state_partition_conf

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with state_partition_conf(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before
    with state_partition_conf(spark, None):
        assert spark.conf.get(key) == before
    assert spark.conf.get(key) == before


def test_rollup_results_identical_across_state_widths(spark, tmp_path):
    """Same emitted windows at width 2 and the session default — state
    partitioning is an execution knob, never an answer knob."""
    import pandas as pd

    from vid_dup_finder_lib_spark.streaming.rollup import run_rollup_to_parquet

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        (i, pd.Timestamp("2031-03-01") + pd.Timedelta(minutes=7 * i), i % 3,
         "click" if i % 2 else "view", float(i), "{}")
        for i in range(400)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / "events"))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    outs = []
    for tag, sp in (("a", 2), ("b", None)):
        out, ckpt = tmp_path / f"out_{tag}", tmp_path / f"ckpt_{tag}"
        q = run_rollup_to_parquet(
            spark, str(src / "events"), str(out), str(ckpt),
            schema=schema, state_partitions=sp,
        )
        q.awaitTermination()
        outs.append(
            sorted(
                tuple(r) for r in spark.read.parquet(str(out)).collect()
            )
        )
    assert outs[0] == outs[1] and outs[0]
    # the sized run really recorded 2 state partitions in its checkpoint
    with open(os.path.join(tmp_path, "ckpt_a", "offsets", "0")) as f:
        meta = f.read()
    assert '"spark.sql.shuffle.partitions":"2"' in meta
