"""Streaming gap sessionization via the BUILT-IN ``session_window``.

The continuous form of ``operators/temporal.sessionize``.  Spark ships a
native session window operator (merging windows under a watermark) — using
it is the Spark-first answer; a hand-rolled ``applyInPandasWithState``
session store would re-implement exactly this with more code and a slower
state path (the repo's one custom stateful op, streaming/dedup.py, exists
because first-seen-wins dedup has no built-in; sessions do).

Semantics:

* events within ``gap`` of each other (per key) merge into one session;
  a session closes when the watermark passes its end + gap;
* append mode emits each closed session exactly once;
* events later than the watermark are dropped (bounded state, like
  streaming/rollup.py).

Parity contract (tested): closed sessions equal the batch
``sessionize`` + groupBy summary on the same non-late rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.temporal import epoch_us


def sessionized_stream(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming DataFrame -> per-session summary (key, start_us, end_us,
    n_events), sessions delimited by ``gap`` inactivity."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark_delay)
        .groupBy(F.session_window(F.col(ts), gap).alias("_w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min(F.col(ts)).alias("_first"),
             F.max(F.col(ts)).alias("_last"))
        .select(
            F.col(key),
            epoch_us(F.col("_first")).alias("start_us"),
            epoch_us(F.col("_last")).alias("end_us"),
            "n_events",
        )
    )


def run_sessions_to_parquet(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema,
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    state_partitions: int | None = None,
):
    """availableNow driver: stream events parquet -> session windows ->
    append-only parquet sink.  Returns the StreamingQuery (await it).

    ``state_partitions``: width of the stateful stage (see
    streaming/util.py) — when set, the query is started AND awaited under
    the scoped conf so the checkpoint records the sized value; the
    returned query is already terminated (awaiting again is a no-op)."""
    from vid_dup_finder_lib_spark.streaming.util import state_partition_conf

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    sessions = sessionized_stream(
        stream, key=key, gap=gap, watermark_delay=watermark_delay
    )
    with state_partition_conf(spark, state_partitions):
        q = (
            sessions.writeStream.outputMode("append")
            .format("parquet")
            .option("path", target_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if state_partitions is not None:
            q.awaitTermination()
    return q
