"""End-to-end dedup pipeline: the spark-submit job graph.

Mirrors the reference CLI's run (``app_fns.rs:82-256`` traced in SURVEY.md
§3.3): refresh signatures (incremental) -> candidates -> verify -> cluster ->
match-DB filters -> metrics/outputs, with every stage checkpointed and
resumable.  This module is what ``spark-submit --py-files`` runs at cluster
scale; the library API (api.py) is the non-persistent form of the same plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

import os

from vid_dup_finder_lib_spark.config import DEFAULT_CONFIG, SigConfig
from vid_dup_finder_lib_spark.operators import matchdb
from vid_dup_finder_lib_spark.operators.grouping import cc_groups, group_stats, matchset_groups
from vid_dup_finder_lib_spark.operators.incremental import (
    compute_signature_delta,
    refresh_signatures,
)
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
from vid_dup_finder_lib_spark.operators.verify import verified_edges
from vid_dup_finder_lib_spark.plans.checkpoint import CheckpointStore
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore


@dataclass
class PipelineResult:
    signatures: DataFrame
    edges: DataFrame
    groups: DataFrame
    stats: DataFrame
    metrics: dict
    # the corpus AFTER the preprocessing stages (extraction, URL collapse,
    # strips, gates, paragraph rewrite) — what downstream consumers (e.g.
    # --emit-corpus) must read instead of the raw input, or they'd ship
    # text the signatures were never built over
    docs: DataFrame | None = None


def run_dedup_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_root: str,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    grouping: str = "cc",
    falsepos: DataFrame | None = None,
    confirmed: DataFrame | None = None,
    id_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    force: bool = False,
    canonicalize_urls: bool = False,
    strip_boilerplate: bool = False,
    boilerplate_min_df: tuple[int, int] = (1, 2),
    quality_gate: bool = False,
    quality_min_tokens: int = 50,
    dedup_paragraphs: bool = False,
    paragraph_line_tokens: int = 8,
    dedup_spans: bool = False,
    span_k: int = 50,
    decontam_docs: DataFrame | None = None,
    decontam_ngram: int = 13,
    reload_errors: bool = False,
    signature_buckets: int = 64,
    extract_html: bool = False,
    html_col: str = "html",
    signature_unit: str = "token",
) -> PipelineResult:
    """Resumable end-to-end run.  Re-invoking with the same checkpoint_root
    and config resumes after the last completed stage; with changed config
    the store refuses (fingerprint guard).

    ``canonicalize_urls``: optional first stage — collapse crawl revisits
    to the newest capture per canonical URL (dedup.latest_snapshot_per_url)
    before any signature work; survivors carry ``canonical_url`` and
    ``n_snapshots`` lineage columns through the checkpoint.
    ``strip_boilerplate``: optional pre-signature high-df line strip (the
    letterbox-crop analog; off by default like the reference CLI's
    ``Cropdetect::None``).  ``reload_errors``: retry cached error rows
    (``--reload-errs``).

    ``quality_gate``: optional pre-signature quality filter — drop docs
    failing the Gopher-style repetition/short-doc flags
    (functions/textstats.gopher_repetition_stats over 8-token re-lining;
    ``quality_min_tokens`` sets the short-doc cutoff).  The drop is a
    checkpointed stage, so the removed count is durable lineage, never a
    silent loss.

    ``dedup_paragraphs`` interaction warning (measured, not hypothetical):
    first-occurrence-wins paragraph dedup REWRITES later copies — their
    shared lines are stripped, so a near-verbatim copy of an earlier doc
    can shrink below the ±length band and stop pairing with its original.
    On a corpus whose duplication is mostly whole-document, run paragraph
    dedup AFTER the near-dup pass (on the emitted survivors), not before;
    before is right when the duplication is passage-level (boilerplate,
    syndication).  The drop lineage (n_lines/n_kept per doc) is durable in
    the stage table either way.

    The strip/gate knobs are part of the stage fingerprint: toggling
    ``strip_boilerplate``/``quality_gate`` or changing their thresholds
    against an existing checkpoint REFUSES (validate-or-die) instead of
    silently reusing a ``docs_stripped``/``docs_quality``/``signatures``
    table computed under the other preprocessing — the refresh diff keys
    on ``warc_ts``, which both stages preserve, so without the fingerprint
    the staleness would be invisible.  (The quality keys join the
    fingerprint only when the gate is ON, so existing gate-less
    checkpoints keep their fingerprints.)"""
    extra_fp = {
        "canonicalize_urls": canonicalize_urls,
        "strip_boilerplate": strip_boilerplate,
        "boilerplate_min_df": list(boilerplate_min_df),
    }
    if quality_gate:
        extra_fp["quality_gate"] = True
        extra_fp["quality_min_tokens"] = quality_min_tokens
    if dedup_paragraphs:
        extra_fp["dedup_paragraphs"] = True
        extra_fp["paragraph_line_tokens"] = paragraph_line_tokens
    if dedup_spans:
        extra_fp["dedup_spans"] = True
        extra_fp["span_k"] = span_k
    if decontam_docs is not None:
        extra_fp["decontam"] = True
        extra_fp["decontam_ngram"] = decontam_ngram
    if extract_html:
        extra_fp["extract_html"] = True
    if signature_unit != "token":
        # fingerprint key only when non-default, preserving existing
        # token-unit checkpoints; a unit flip against a cached store then
        # REFUSES instead of silently mixing granularities
        extra_fp["signature_unit"] = signature_unit
    store = CheckpointStore(checkpoint_root, cfg, extra_fingerprint=extra_fp)
    tol = cfg.default_tolerance if tolerance is None else tolerance

    if extract_html:
        # FIRST stage: the north-rule input table is (url, warc_ts,
        # html:binary, text, ...) with the per-row invariant
        # text == extract(html) byte-identical.  Two modes:
        #   * input has no text column -> CREATE it from html (the frozen
        #     extractor, extraction.py) and drop the heavy binary so it
        #     never flows through later checkpoints;
        #   * input already has text -> VALIDATE the invariant row by row
        #     and RAISE with the mismatch count (validate-or-die: a stale
        #     or foreign text column silently changes every downstream
        #     signature, which the warc_ts refresh diff cannot see).
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.extraction import extract_text_col

        has_text = text_col in docs.columns

        def _extracted():
            if has_text:
                ext = docs.withColumn("__ext", extract_text_col(F.col(html_col)))
                # eqNullSafe: a plain == is NULL when exactly one side is
                # null, and where() drops NULL rows — a stale null text
                # with extractable html would silently pass the gate
                bad = ext.where(
                    ~F.col(text_col).eqNullSafe(F.col("__ext"))
                ).count()
                if bad:
                    raise ValueError(
                        f"extract_html: {bad} rows violate the per-row "
                        f"invariant {text_col} == extract({html_col}) — "
                        "refusing to build signatures over a text column "
                        "that does not match its html"
                    )
                return docs.drop(html_col)
            return docs.withColumn(
                text_col, extract_text_col(F.col(html_col))
            ).drop(html_col)

        docs = store.run_stage(
            spark, "docs_extracted", _extracted, upstream=["docs"], force=force
        )

    if canonicalize_urls:
        from vid_dup_finder_lib_spark.operators.dedup import latest_snapshot_per_url

        def _canonical():
            return latest_snapshot_per_url(docs, url_col=id_col, ts_col=ts_col)

        docs = store.run_stage(
            spark, "docs_canonical", _canonical, upstream=["docs"], force=force
        )

    if strip_boilerplate:
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.operators import boilerplate as bp

        def _stripped():
            num, den = boilerplate_min_df
            out = bp.strip_boilerplate(
                docs, num, den, id_col=id_col, text_col=text_col
            )
            # keep the timestamp column: the refresh diff still keys on it
            return out.select(
                F.col("id").alias(id_col),
                F.col("text_stripped").alias(text_col),
            ).join(docs.select(id_col, ts_col), id_col)

        docs = store.run_stage(
            spark, "docs_stripped", _stripped, upstream=["docs"], force=force
        )

    if quality_gate:
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.functions.textstats import (
            gopher_repetition_stats,
            token_lines,
            whitespace_token_count,
        )

        def _quality():
            lines = token_lines(F.col(text_col), 8)
            flags = gopher_repetition_stats(
                lines, whitespace_token_count(F.col(text_col)), quality_min_tokens
            )
            return docs.where(
                ~(flags["dup_line_flag"] | flags["short_doc_flag"])
            )

        docs = store.run_stage(
            spark, "docs_quality", _quality, upstream=["docs"], force=force
        )

    if dedup_paragraphs:
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.functions.textstats import token_lines
        from vid_dup_finder_lib_spark.operators import boilerplate as bp

        def _para_dedup():
            # RefinedWeb-style corpus-global first-occurrence-wins paragraph
            # dedup as a rewrite stage: the rewritten text (surviving lines
            # re-joined) feeds the signature kernel; drop lineage (n_lines,
            # n_kept) is durable in the stage table, never silent
            lined = docs.select(
                F.col(id_col),
                token_lines(F.col(text_col), paragraph_line_tokens).alias(
                    "__lines"
                ),
            )
            out = bp.dedup_lines_first_wins(
                lined, id_col=id_col, lines_col="__lines", emit_text=True
            )
            return out.select(
                F.col(id_col),
                F.col("text_kept").alias(text_col),
                "n_lines",
                "n_kept",
            ).join(docs.select(id_col, ts_col), id_col)

        docs = store.run_stage(
            spark, "docs_paragraphs", _para_dedup, upstream=["docs"], force=force
        ).drop("n_lines", "n_kept")

    if dedup_spans:
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.operators.substring import (
            duplicate_span_rewrite,
        )

        def _span_dedup():
            # ExactSubstr rewrite stage (Lee et al. ACL 2022): every
            # duplicated >= span_k-token span is cut from all but its
            # globally-first occurrence.  The kept text is rebuilt from
            # NORMALIZED tokens (lower + whitespace-collapse — the same
            # canonicalization the signature kernel applies next), and the
            # removal lineage (n_tokens, removed_tokens) is durable in the
            # stage table, never silent.  Corpus-GLOBAL like the paragraph
            # stage: the same ordering interaction applies (a mostly-
            # whole-document-dup corpus should span-dedup AFTER the
            # near-dup pass, passage-level duplication before).
            out = duplicate_span_rewrite(
                docs, k=span_k, id_col=id_col, text_col=text_col
            )
            return out.select(
                F.col(id_col),
                F.col("kept_text").alias(text_col),
                "n_tokens",
                "removed_tokens",
            ).join(docs.select(id_col, ts_col), id_col)

        docs = store.run_stage(
            spark, "docs_spans", _span_dedup, upstream=["docs"], force=force
        ).drop("n_tokens", "removed_tokens")

    if decontam_docs is not None:
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.operators.decontam import (
            benchmark_contamination,
        )

        def _decontam():
            # drop any training doc sharing a verbatim n-gram with the
            # benchmark corpus; the flags (incl. clean zeros) are durable
            # in the stage table — removals are lineage, never silent.
            # Per-doc vs a broadcast benchmark: batch-replayable, so this
            # stage does NOT block --incremental-add the way the
            # corpus-global strips do (the CLI still routes mutations to
            # the full pipeline).
            flags = benchmark_contamination(
                docs, decontam_docs, n=decontam_ngram,
                id_col=id_col, text_col=text_col,
                bench_id_col=decontam_docs.columns[0],
                bench_text_col=("text" if "text" in decontam_docs.columns
                                else decontam_docs.columns[-1]),
            )
            return docs.join(
                flags.where(~F.col("contaminated")).select(id_col),
                id_col,
                "left_semi",
            )

        docs = store.run_stage(
            spark, "docs_decontam", _decontam, upstream=["docs"], force=force
        )

    # Signatures persist in the hash-partitioned store: compute is O(delta)
    # (only changed docs hit the Arrow kernel) AND the write is O(delta)
    # (only bucket partitions containing recomputed/deleted ids are
    # rewritten — the MERGE INTO analog; round-2 rewrote the whole table).
    # ``signature_buckets`` sizes the rewrite granularity; see sigstore.py.
    sigstore = PartitionedSignatureStore(
        os.path.join(checkpoint_root, "signatures"),
        cfg,
        num_buckets=signature_buckets,
        extra_fingerprint=store.extra_fingerprint,
    )
    if not force and sigstore.exists():
        cached = sigstore.read(spark)
        recomputed, _kept, deleted = compute_signature_delta(
            docs, cached, cfg, id_col, text_col, ts_col,
            reload_errors=reload_errors, unit=signature_unit,
        )
        sigstore.upsert(recomputed, deleted)
    else:
        sigstore.write_full(
            refresh_signatures(
                docs, None, cfg, id_col, text_col, ts_col,
                reload_errors=reload_errors, unit=signature_unit,
            )
        )
    sigs = sigstore.read(spark)

    def _edges():
        pairs, quarantined = candidate_pairs(sigs, cfg)
        store.write("quarantined_buckets", quarantined, upstream=["signatures"])
        e = verified_edges(pairs, sigs, cfg, tolerance=tol)
        if falsepos is not None:
            e = matchdb.remove_falsepos_edges(e, falsepos)  # J7: pre-CC edge removal
        return e

    edges = store.run_stage(spark, "edges", _edges, upstream=["signatures"], force=force)

    def _groups():
        e = edges
        if confirmed is not None:
            e = matchdb.remove_known_matches(e, confirmed)  # J6
        return matchset_groups(e) if grouping == "matchset" else cc_groups(e)

    groups = store.run_stage(spark, "groups", _groups, upstream=["edges"], force=force)

    def _stats():
        return group_stats(groups.select("cluster_id", "id"), edges)

    stats = store.run_stage(spark, "group_stats", _stats, upstream=["groups", "edges"], force=force)

    return PipelineResult(
        signatures=sigs,
        edges=edges,
        groups=groups,
        stats=stats,
        metrics=store.metrics(),
        docs=docs,
    )
