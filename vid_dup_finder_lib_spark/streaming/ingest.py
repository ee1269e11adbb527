"""Structured Streaming ingestion of the signatures stage.

The reference is batch-with-incrementality (SURVEY.md §2.10 — no streaming
operators exist), and the main pipeline follows it via incremental.py.  This
module is the *continuous* form of the same contract for deployments where
the docs table grows as a stream (e.g. WARC drops landing in object
storage): ``readStream`` over the docs source -> the exact same Arrow
signature stage -> ``foreachBatch`` merge into the signatures checkpoint
table.  Because the signature stage is stateless per-row, no watermarks or
stateful operators are needed.

Delivery contract: the sink is **append-only with batch lineage** — each
foreachBatch write lands rows tagged ``_batch_id``; a replayed batch appends
duplicate rows rather than overwriting.  Exactly-once semantics therefore
hold at the *read path*: ``read_signature_table`` (the sole documented way to
read this table) keeps the latest row per id.  A raw
``spark.read.parquet(target_dir)`` may observe replay duplicates by design.
At cluster scale the merge body is an Iceberg ``MERGE INTO`` (true idempotent
upsert), isolated behind ``merge_batch`` so nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.operators.signatures import build_signatures


def stream_signatures(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    cfg: SigConfig,
    schema,
    id_col: str = "url",
    text_col: str = "text",
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) a streaming
    query that keeps a parquet signatures table in sync with a growing docs
    directory.  Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sigs = build_signatures(batch_df, cfg, id_col, text_col)
        # append with batch lineage: replayed batches re-append the same ids;
        # read_signature_table dedupes on (id, max _batch_id).  At cluster
        # scale this body is an Iceberg MERGE INTO (true upsert).
        (
            sigs.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(target_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def read_signature_table(spark: SparkSession, target_dir: str) -> DataFrame:
    """Latest signature per id (dedupe across replayed/updated batches)."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(target_dir)
    w = Window.partitionBy("id").orderBy(F.desc("_batch_id"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_batch_id")
    )
