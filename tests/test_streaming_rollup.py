"""Watermarked streaming window rollup: append-once emission, late-data
drop, and batch-parity of the emitted windows."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import Row

from vid_dup_finder_lib_spark.operators.temporal import window_rollup
from vid_dup_finder_lib_spark.streaming.rollup import run_rollup_to_parquet

SCHEMA = "event_id long, event_type string, ts timestamp, value double"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_streaming_rollup_watermark_and_parity(spark, tmp_path):
    src = str(tmp_path / "events")
    tgt = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    b1 = [
        Row(event_id=1, event_type="a", ts=_ts("2024-01-01T10:15:00"), value=0.1),
        Row(event_id=2, event_type="a", ts=_ts("2024-01-01T10:45:00"), value=0.2),
        Row(event_id=3, event_type="a", ts=_ts("2024-01-01T11:05:00"), value=0.7),
        Row(event_id=4, event_type="a", ts=_ts("2024-01-01T14:30:00"), value=1.0),
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(src)
    run_rollup_to_parquet(
        spark, src, tgt, ckpt, schema=SCHEMA, width="1 hour", watermark_delay="2 hours"
    ).awaitTermination()

    def emitted():
        return {
            r.window_start_us: (r.n_events, str(r.value_sum))
            for r in spark.read.parquet(tgt).collect()
        }

    def us(s):
        return int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    # watermark = 14:30 - 2h = 12:30 -> only windows ending <= 12:30 emitted;
    # the 14:00 window stays open in state
    first = emitted()
    assert first == {
        us("2024-01-01T10:00:00"): (2, "0.30"),
        us("2024-01-01T11:00:00"): (1, "0.70"),
    }

    # second drop: one new event far ahead (advances the watermark past the
    # 14:00 window) and one LATE event behind the watermark (must be dropped,
    # NOT re-open the already-emitted 10:00 window)
    b2 = [
        Row(event_id=5, event_type="a", ts=_ts("2024-01-01T18:05:00"), value=5.0),
        Row(event_id=6, event_type="a", ts=_ts("2024-01-01T10:50:00"), value=9.9),
    ]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    run_rollup_to_parquet(
        spark, src, tgt, ckpt, schema=SCHEMA, width="1 hour", watermark_delay="2 hours"
    ).awaitTermination()

    second = emitted()
    # 14:00 window now closed and emitted once; 10:00 window unchanged (late
    # row dropped); 18:00 window still open (not emitted)
    assert second == {
        us("2024-01-01T10:00:00"): (2, "0.30"),
        us("2024-01-01T11:00:00"): (1, "0.70"),
        us("2024-01-01T14:00:00"): (1, "1.00"),
    }

    # batch parity: every emitted window equals the batch rollup on the
    # non-late input rows (streaming is an execution mode, not a different
    # answer)
    batch = {
        r.window_start_us: (r.n_events, str(r.value_sum))
        for r in window_rollup(
            spark.createDataFrame(b1 + b2[:1], SCHEMA), width="hour", group_cols=()
        ).collect()
    }
    for k, v in second.items():
        assert batch[k] == v


def test_streaming_sessions_parity_with_batch(spark, tmp_path):
    """Built-in session_window under a watermark: closed sessions emitted
    once, and equal to the batch sessionize summary on the same rows."""
    from vid_dup_finder_lib_spark.operators.temporal import sessionize
    from vid_dup_finder_lib_spark.streaming.sessions import run_sessions_to_parquet

    src = str(tmp_path / "ev2")
    tgt = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt2")

    rows = [
        # user 1: two sessions (10:00-10:20, then 11:30)
        Row(event_id=1, event_type="a", ts=_ts("2024-01-01T10:00:00"), value=0.0),
        Row(event_id=2, event_type="a", ts=_ts("2024-01-01T10:20:00"), value=0.0),
        Row(event_id=3, event_type="a", ts=_ts("2024-01-01T11:30:00"), value=0.0),
        # a far-future row advances the watermark so everything above closes
        Row(event_id=9, event_type="z", ts=_ts("2024-01-02T12:00:00"), value=0.0),
    ]
    schema2 = "event_id long, event_type string, ts timestamp, value double"
    # single-user sessions keyed on event_type here to reuse the schema
    spark.createDataFrame(rows, schema2).coalesce(1).write.parquet(src)
    run_sessions_to_parquet(
        spark, src, tgt, ckpt, schema=schema2, key="event_type",
        gap="30 minutes", watermark_delay="1 hour",
    ).awaitTermination()

    got = {
        (r.event_type, r.start_us, r.end_us): r.n_events
        for r in spark.read.parquet(tgt).collect()
    }

    batch = sessionize(
        spark.createDataFrame(rows[:3], schema2).select("event_type", "ts", "event_id"),
        key="event_type", gap_seconds=1800,
    )
    from pyspark.sql import functions as F
    from vid_dup_finder_lib_spark.operators.temporal import epoch_us as _eus
    exp = {
        (r.event_type, r.start_us, r.end_us): r.n_events
        for r in batch.groupBy("event_type", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(_eus("ts")).alias("start_us"),
            F.max(_eus("ts")).alias("end_us"),
        )
        .collect()
    }
    # the far-future 'z' session is still open (not emitted); every closed
    # session matches the batch summary
    assert got == exp
    assert len(got) == 2
