"""Stateful streaming exact-dedup: first-seen-wins over a document stream.

The batch pipeline dedupes exactly via hash-groupBy (operators/dedup.py);
this is the *continuous* form a training-data ingest needs: documents arrive
as a stream, and only the first occurrence of each content hash is ever
emitted downstream — across batches, restarts and replays — using
``applyInPandasWithState`` (the custom-stateful-operator surface the task
brief names).  State per content_hash is one boolean; Spark's HDFS-backed
state store shards it by the grouping key, so state size scales with
*distinct* documents and never concentrates on one executor.

Within a batch, the survivor is the minimum id (the reference's
deterministic sort-order tiebreak, search_algorithm.rs:56-61); across
batches, the state store enforces first-batch-wins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, id string, n_dups_in_batch long"
STATE_SCHEMA = "seen boolean"


def _dedup_fn(key, pdfs, state):
    if state.exists:
        # already emitted in an earlier batch: swallow everything
        for _ in pdfs:
            pass
        return iter(())
    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows) == 0:
        return iter(())
    state.update((True,))
    survivor = rows["id"].astype(str).min()
    return iter(
        [
            pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "id": [survivor],
                    "n_dups_in_batch": [len(rows)],
                }
            )
        ]
    )


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema,
    id_col: str = "url",
    text_col: str = "text",
    available_now: bool = True,
    state_partitions: int | None = None,
):
    """Continuously emit (content_hash, id, n_dups_in_batch) for the FIRST
    occurrence of each distinct document text; duplicates (in-batch or
    later-batch) are dropped.  Returns the StreamingQuery.

    ``state_partitions``: width of the stateful stage (see
    streaming/util.py); only honored with ``available_now`` (the query is
    awaited inside the scoped conf)."""
    from vid_dup_finder_lib_spark.streaming.util import state_partition_conf
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    # sha2(null) is null: without the coalesce every null-text doc would land
    # in ONE state group and all but the first would be swallowed forever as
    # "duplicates".  Null-text docs are not duplicates of each other (the
    # batch path likewise excludes null hashes from survivor selection,
    # operators/dedup.py), so each gets a per-id synthetic key and is always
    # emitted.
    keyed = stream.select(
        F.coalesce(
            F.sha2(F.col(text_col), 256),
            F.concat(F.lit("null:"), F.col(id_col).cast("string")),
        ).alias("content_hash"),
        F.col(id_col).cast("string").alias("id"),
    )
    survivors = keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        survivors.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        with state_partition_conf(spark, state_partitions):
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        return q
    return writer.start()
