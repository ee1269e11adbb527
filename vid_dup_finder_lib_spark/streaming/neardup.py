"""Streaming incremental NEAR-dup dedup: the crawl-ingest form of the
batch LSH pipeline.

``streaming/dedup.py`` answers "have I seen these exact bytes?" with
per-hash state; this module answers the reference's actual question —
"is this within tolerance of anything I already kept?" — continuously.
Each micro-batch is signature-hashed once (the Arrow kernel), LSH-searched
against BOTH itself and the persisted
:class:`~vid_dup_finder_lib_spark.plans.sigstore.PartitionedSignatureStore`
of previously-kept survivors, and only genuinely novel documents are
admitted to the store.  This is the streaming composition of three tested
pieces — build_signatures, refs_edges_from_signatures (J3, no consume),
and the O(delta) sigstore upsert — not new search machinery.

Canonical-assignment rule (deterministic, arrival-order greedy — the
reference's first-seen matchset seed rule, search_algorithm.rs:56-61,
applied across batches):

* within the batch, near-dup docs are grouped by connected components
  (label = min member id);
* a component any member of which matches a stored survivor canonicalizes
  to the MINIMUM matched survivor id (the store holds only canonical docs,
  so no chain-chasing is ever needed);
* otherwise the component label itself is the canonical id and that one
  doc is upserted as the component's survivor.

Consequence (documented, inherent to survivor-only state): a later doc
within tolerance of a *dropped* duplicate but not of its surviving
canonical is admitted as novel — the same radius-vs-transitive-closure
trade the batch CC pipeline makes per-run, applied greedily across time.

Crash/replay idempotency: foreachBatch may replay a batch after a crash.
Replay re-derives the same canonicals — a survivor already upserted
matches itself in the store only via the ``id1 != id2`` guard's exclusion
(same id), while its batch partners re-match it as an old edge and land on
the same canonical — and the per-batch output directory is overwritten
atomically, so the emitted mapping and the store content both converge to
the same state.

Scale shape (100 TB/day ingest): per batch, ONE Arrow pass over the new
docs; the store side ships only band keys + the verify-needed arrays
(never shingles) through the candidate join; the store rewrite is
O(delta buckets).  State lives in the partitioned store, not the Spark
state store — restarts re-read the manifest, and the store's journaled
generations give the stream time travel for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import DEFAULT_CONFIG, SigConfig
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore

OUTPUT_COLS = ("id", "canonical_id", "is_survivor")


def assign_canonicals(
    spark: SparkSession,
    sigs_new: DataFrame,
    store: PartitionedSignatureStore,
    cfg: SigConfig,
    tolerance: float,
    id_col: str = "id",
) -> DataFrame:
    """One batch of the incremental rule; returns (id, canonical_id,
    is_survivor).  ``sigs_new`` must be materialized build_signatures
    output keyed by ``id``."""
    from vid_dup_finder_lib_spark.api import refs_edges_from_signatures
    from vid_dup_finder_lib_spark.operators.components import connected_components
    from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
    from vid_dup_finder_lib_spark.operators.verify import verified_edges

    pairs, _q = candidate_pairs(sigs_new, cfg)
    edges_nn = (
        verified_edges(pairs, sigs_new, cfg, tolerance=tolerance)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    ids = sigs_new.select(F.col(id_col).alias("id"))
    comp = ids.join(connected_components(edges_nn), "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    if store.exists():
        old_edges = refs_edges_from_signatures(
            store.read(spark), sigs_new, tolerance, cfg, length_band="self"
        )
        old_min = old_edges.groupBy(F.col("cand_id").alias("id")).agg(
            F.min("ref_id").alias("old_match")
        )
    else:
        id_type = sigs_new.schema[id_col].dataType
        old_min = ids.select(
            "id", F.lit(None).cast(id_type).alias("old_match")
        ).limit(0)
    # joined feeds both the per-component min and the final assignment
    # join: materialize, or the store-side refs search upstream of old_min
    # executes once per consumer
    joined = comp.join(old_min, "id", "left").localCheckpoint(eager=True)
    comp_old = joined.groupBy("component").agg(
        F.min("old_match").alias("comp_old")
    )
    return (
        joined.join(comp_old, "component")
        .select(
            "id",
            F.coalesce("comp_old", F.col("component")).alias("canonical_id"),
        )
        .withColumn("is_survivor", F.col("canonical_id") == F.col("id"))
    )


def stream_neardup_dedup(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    store: PartitionedSignatureStore,
    schema,
    cfg: SigConfig = DEFAULT_CONFIG,
    tolerance: float | None = None,
    id_col: str = "url",
    text_col: str = "text",
    available_now: bool = True,
    max_files_per_trigger: int = 64,
    extract_html: bool = False,
    html_col: str = "html",
    state_partitions: int | None = None,
):
    """Run the incremental near-dup ingest; returns the StreamingQuery.

    Emits ``out_dir/batch=<n>/`` parquet with (id, canonical_id,
    is_survivor) per arriving doc and grows ``store`` by exactly the
    survivors.  ``id_col`` values are compared as strings (the signature
    kernel's key domain — mind '100002' < '2').

    ``extract_html``: accept the crawl-native batch shape (``html_col``
    binary, no text) — the frozen extractor builds ``text_col`` inside
    each micro-batch before the signature pass (the streaming twin of the
    pipeline's ``--extract-html`` stage; per-doc, hence replay-idempotent
    like the rest of foreachBatch).  Batches that already carry
    ``text_col`` refuse: a stream mixing pre-extracted and raw shapes
    would silently build signatures over two different text provenances.
    """
    tol = cfg.default_tolerance if tolerance is None else tolerance

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from vid_dup_finder_lib_spark.operators.signatures import build_signatures

        if extract_html:
            from vid_dup_finder_lib_spark.extraction import extract_text_col

            if text_col in batch_df.columns:
                raise ValueError(
                    f"stream_neardup_dedup(extract_html=True): the batch "
                    f"already carries {text_col!r} — mixed text provenance; "
                    "drop the column from the source or turn extraction off"
                )
            batch_df = batch_df.withColumn(
                text_col, extract_text_col(F.col(html_col))
            ).drop(html_col)
        # build_signatures always emits the key as column "id" (the Arrow
        # kernel's schema), whatever the input id_col was
        sigs_new = build_signatures(batch_df, cfg, id_col, text_col).localCheckpoint(
            eager=True
        )
        if sigs_new.limit(1).count() == 0:
            return
        assigned = assign_canonicals(
            spark, sigs_new, store, cfg, tol
        ).localCheckpoint(eager=True)
        assigned.select(*OUTPUT_COLS).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        survivors = sigs_new.join(
            assigned.where(F.col("is_survivor")).select("id"), "id", "left_semi"
        )
        if store.exists():
            store.upsert(survivors, id_col="id")
        else:
            store.write_full(survivors, id_col="id")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        from vid_dup_finder_lib_spark.streaming.util import state_partition_conf

        # no Spark state store here (state is the signature store), but the
        # per-batch join/agg shuffles read the same conf — sized like the
        # stateful runners (see streaming/util.py)
        with state_partition_conf(spark, state_partitions):
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        return q
    return writer.start()
