"""spark-submit entry point.

Usage (cluster):
    spark-submit --py-files vid_dup_finder_lib_spark.zip \
        -m vid_dup_finder_lib_spark.plans.job \
        --docs s3://corpus/docs --checkpoint s3://state/run1 --tolerance 0.2

Usage (local, as packaged here):
    python -m vid_dup_finder_lib_spark.plans.job \
        --docs /path/docs.parquet --checkpoint /tmp/ckpt --tolerance 0.2

The CLI mirrors the reference app's surface (``vid_dup_finder_app``:
``--files``/``--with-refs``/``--matchdb`` -> --docs/--refs/--confirmed/
--falsepos; SURVEY.md §3.3) and re-runs resume from the checkpoint store.
"""

from __future__ import annotations

import argparse
import json
import sys


def _flag_extras(args) -> dict:
    """The flag-derived store-fingerprint extras: a fold invocation with
    different preprocessing flags than the pipeline run fails fast instead
    of folding into a semantically different corpus."""
    return {
        "canonicalize_urls": args.canonicalize_urls,
        "strip_boilerplate": args.strip_boilerplate,
        "boilerplate_min_df": [
            int(x) for x in args.boilerplate_min_df.split("/")
        ],
        **(
            {"quality_gate": True,
             "quality_min_tokens": args.quality_min_tokens}
            if args.quality_gate
            else {}
        ),
        **(
            {"dedup_paragraphs": True,
             "paragraph_line_tokens": args.paragraph_line_tokens}
            if args.dedup_paragraphs
            else {}
        ),
        **(
            {"dedup_spans": True, "span_k": args.span_k}
            if args.dedup_spans
            else {}
        ),
        **(
            {"decontam": True, "decontam_ngram": args.decontam_ngram}
            if args.decontam
            else {}
        ),
        **({"extract_html": True} if args.extract_html else {}),
        **(
            {"signature_unit": args.signature_unit}
            if args.signature_unit != "token"
            else {}
        ),
    }


def build_parser() -> argparse.ArgumentParser:
    """The CLI parser, exposed so callers can reproduce the flag-derived
    store-fingerprint extras (``_flag_extras``) for a given invocation."""
    p = argparse.ArgumentParser(description="near-dup detection pipeline")
    p.add_argument(
        "--docs",
        help="parquet path of the docs table (required unless --restore/"
             "--list-snapshots)",
    )
    p.add_argument("--checkpoint", required=True, help="checkpoint store root")
    p.add_argument("--tolerance", type=float, default=None)
    p.add_argument("--grouping", choices=["cc", "matchset"], default="cc")
    p.add_argument("--confirmed", help="parquet of confirmed pairs (id1,id2)")
    p.add_argument("--falsepos", help="parquet of falsepos pairs (id1,id2)")
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--ts-col", default="warc_ts")
    p.add_argument("--output", help="write groups to this path")
    p.add_argument(
        "--output-format", choices=["parquet", "json"], default="parquet",
        help="groups sink format (S7: the reference emits text/JSON groups, "
        "search_output.rs:81-150)",
    )
    p.add_argument("--output-unique", help="also write docs with no duplicate (J9)")
    p.add_argument("--force", action="store_true", help="ignore completed stages")
    p.add_argument(
        "--canonicalize-urls", action="store_true",
        help="collapse crawl revisits to the newest capture per canonical "
             "URL before signature work (dedup.latest_snapshot_per_url)",
    )
    p.add_argument(
        "--strip-boilerplate", action="store_true",
        help="pre-signature high-df line strip (letterbox-crop analog; the "
        "reference CLI's --cropdetect, default off = Cropdetect::None)",
    )
    p.add_argument(
        "--boilerplate-min-df", default="1/2", metavar="NUM/DEN",
        help="df threshold for a line to count as boilerplate (exact fraction)",
    )
    p.add_argument(
        "--reload-errs", action="store_true",
        help="retry cached error rows (the reference's --reload-errs)",
    )
    p.add_argument(
        "--extract-html", action="store_true",
        help="first stage: build the text column from the html binary "
             "column via the frozen extractor (checkpointed; the binary is "
             "dropped after).  If the input ALREADY has a text column, the "
             "stage validates text == extract(html) per row and refuses on "
             "any mismatch (the north-rule per-row invariant)",
    )
    p.add_argument("--html-col", default="html")
    p.add_argument(
        "--quality-gate", action="store_true",
        help="drop docs failing the Gopher-style repetition/short-doc flags "
             "before signature work (checkpointed stage: the removed count "
             "is durable lineage, not a silent loss)",
    )
    p.add_argument(
        "--quality-min-tokens", type=int, default=50, metavar="N",
        help="short-doc cutoff for --quality-gate (default 50)",
    )
    p.add_argument(
        "--dedup-paragraphs", action="store_true",
        help="corpus-global first-occurrence-wins paragraph dedup as a "
             "rewrite stage before signature work (RefinedWeb exact "
             "paragraph dedup; drop lineage durable in docs_paragraphs)",
    )
    p.add_argument(
        "--paragraph-line-tokens", type=int, default=8, metavar="N",
        help="tokens per re-lined paragraph for --dedup-paragraphs (default 8)",
    )
    p.add_argument(
        "--dedup-spans", action="store_true",
        help="corpus-global ExactSubstr span dedup as a rewrite stage "
             "before signature work (Lee et al. 2022: duplicated >= K-token "
             "spans cut from all but the globally-first occurrence; "
             "removal lineage durable in docs_spans)",
    )
    p.add_argument(
        "--span-k", type=int, default=50, metavar="K",
        help="minimum duplicated span length for --dedup-spans (default 50)",
    )
    p.add_argument(
        "--decontam", metavar="BENCHDOCS",
        help="benchmark-decontamination stage: drop training docs sharing "
             "any verbatim n-gram with this parquet benchmark corpus "
             "(checkpointed docs_decontam stage; per-doc flags durable)",
    )
    p.add_argument(
        "--decontam-ngram", type=int, default=13, metavar="N",
        help="n-gram length for --decontam (default 13)",
    )
    p.add_argument(
        "--incremental-add", metavar="NEWDOCS",
        help="ADDITIVE incremental fold: cluster a parquet batch of brand-"
             "new docs against an existing checkpoint (signature store + "
             "groups stage) WITHOUT recomputing the old corpus, and write "
             "the updated (cluster_id, id) assignment to --output.  "
             "Read-only on the checkpoint unless --incremental-commit.  "
             "cc grouping only; ids already in the store refuse",
    )
    p.add_argument(
        "--incremental-delete", metavar="IDS",
        help="DELETION fold (takedowns / right-to-be-forgotten): remove a "
             "parquet list of doc ids (first column) from an existing "
             "checkpoint's clustering, re-solving ONLY components that "
             "lost a member (bucket-pruned store read; exact — deletion "
             "never merges components), and write the updated "
             "(cluster_id, id) assignment to --output.  Preprocessing "
             "state (boilerplate df counts etc.) stays frozen at full-run "
             "time.  Read-only on the checkpoint unless "
             "--incremental-commit.  cc grouping only",
    )
    p.add_argument(
        "--merge-with", metavar="OTHER_CHECKPOINT",
        help="SHARD MERGE: combine this checkpoint's clustering with "
             "another checkpoint's (two shards built independently over "
             "DISJOINT id sets — two monthly crawls, two halves of a "
             "sharded build) into one clustering WITHOUT re-searching "
             "within either side: only the cross edges A×B are computed "
             "(LSH band join between the two signature stores), then the "
             "two assignments merge via the star-contraction identity — "
             "provably equal to a full run over the union corpus.  Writes "
             "the merged (cluster_id, id) assignment to --output; "
             "read-only on both checkpoints unless --incremental-commit "
             "(which grows THIS checkpoint's store by the other's rows).  "
             "cc grouping only; overlapping ids refuse",
    )
    p.add_argument(
        "--incremental-commit", action="store_true",
        help="with --incremental-add/--incremental-delete/--merge-with: "
             "also apply the fold to the signature store (O(delta) bucket "
             "rewrite) so later folds see it",
    )
    p.add_argument(
        "--sweep-tolerances", metavar="T1,T2,...",
        help="after the run, also emit clusterings at these TIGHTER "
             "tolerances from the SAME verified edge set (one filter + CC "
             "pass per level — no re-hash, no re-join; the reference GUI "
             "re-runs the whole search per tolerance change) to "
             "<output>_sweep as (radius, cluster_id, id).  cc grouping "
             "only; every level must be <= the run tolerance",
    )
    p.add_argument(
        "--restore", metavar="STAGE",
        help="restore STAGE's newest retained snapshot generation and exit "
             "(repeatable restores walk further back; the reference keeps "
             "timestamped match-DB backups, match_db.rs:358-374)",
    )
    p.add_argument(
        "--list-snapshots", action="store_true",
        help="print retained snapshot generations per stage and exit",
    )
    p.add_argument(
        "--emit-corpus", metavar="OUTDIR",
        help="after the run, write the deduplicated corpus (one min-id "
             "survivor per near-dup cluster + all unmatched docs, with the "
             "pipeline-processed text) packed into token-budget shards "
             "under OUTDIR/data plus OUTDIR/manifest.json (cc grouping "
             "only)",
    )
    p.add_argument(
        "--shard-tokens", type=int, default=1_000_000,
        help="token budget per emitted shard (whitespace tokens; default 1M)",
    )
    p.add_argument(
        "--signature-unit", choices=["token", "char"], default="token",
        dest="signature_unit",
        help="signature granularity: whitespace tokens (default) or "
             "characters (the unsegmented-script mode, "
             "build_signatures(unit='char')); joins the checkpoint "
             "fingerprint when char, so a unit flip against an existing "
             "checkpoint refuses",
    )
    p.add_argument(
        "--survivor-rule", choices=["min-id", "medoid", "quality"],
        default="min-id",
        dest="survivor_rule",
        help="--emit-corpus survivor choice: smallest member id (default), "
             "the most-central member by summed incident edge Jaccard "
             "mass (dedup.medoid_survivors), or the member with the most "
             "pipeline-processed tokens — the longest-extraction rule "
             "(dedup.priority_survivors, ties -> min id)",
    )
    p.add_argument(
        "--report", metavar="OUTDIR",
        help="read-only ops reports over a COMPLETED checkpoint: cluster "
             "size histogram (sizes.parquet; --docs adds the singleton "
             "bucket) and, with --docs, a leakage-free cluster-coherent "
             "80/10/10 split (splits.parquet) — no signature work is rerun",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    p = build_parser()
    args = p.parse_args(argv)
    if not args.docs and not (
        args.restore or args.list_snapshots or args.incremental_add
        or args.incremental_delete or args.merge_with or args.report
    ):
        p.error(
            "--docs is required unless --restore/--list-snapshots/"
            "--incremental-add/--incremental-delete/--merge-with/--report"
        )
    if (
        args.incremental_add or args.incremental_delete or args.merge_with
    ) and not args.output:
        p.error(
            "--incremental-add/--incremental-delete/--merge-with require "
            "--output"
        )
    if args.merge_with and (args.incremental_add or args.incremental_delete):
        p.error(
            "--merge-with is one fold: run add/delete folds as separate "
            "invocations (order matters for labels)"
        )
    # --signature-unit char runs on every fold mode: --incremental-add
    # threads it into the batch-side signature build, and delete/merge
    # only re-search STORED signatures (granularity travels with them).
    # A unit flip against an existing store fails fast regardless — the
    # store fingerprint carries signature_unit (_flag_extras).
    if args.emit_corpus and (
        args.incremental_add or args.incremental_delete or args.merge_with
        or args.report or args.restore or args.list_snapshots
    ):
        p.error(
            "--emit-corpus runs only with the full pipeline: the fold/"
            "report/recovery modes return before the emit step — rerun the "
            "full job (its stages resume from the checkpoint) to export"
        )
    if args.sweep_tolerances and not args.output:
        p.error("--sweep-tolerances requires --output")
    if args.sweep_tolerances and args.grouping != "cc":
        p.error("--sweep-tolerances supports cc grouping only (greedy "
                "matchsets are order-sensitive; no per-level reuse exists)")
    if args.incremental_add and args.incremental_delete:
        p.error(
            "--incremental-add and --incremental-delete are one fold each: "
            "run them as separate invocations (order matters for labels)"
        )

    from pyspark.sql import SparkSession

    from vid_dup_finder_lib_spark.config import DEFAULT_CONFIG
    from vid_dup_finder_lib_spark.plans.pipeline import run_dedup_pipeline

    if args.restore or args.list_snapshots:
        # recovery modes need no Spark session and no docs scan
        import os

        from vid_dup_finder_lib_spark.plans.checkpoint import CheckpointStore

        store = CheckpointStore(
            args.checkpoint,
            DEFAULT_CONFIG,
            extra_fingerprint=_flag_extras(args),
        )
        if args.list_snapshots:
            stages = sorted(
                d for d in os.listdir(args.checkpoint) if not d.startswith(".")
            )
            print(json.dumps(
                {s: store.snapshots(s) for s in stages}, indent=2, sort_keys=True
            ))
            return 0
        m = store.restore(args.restore)
        print(json.dumps({
            "restored": args.restore,
            "row_count": m.get("row_count"),
            "remaining_snapshots": store.snapshots(args.restore),
        }, indent=2))
        return 0

    if args.report:
        # read-only: everything derives from the completed groups stage
        import os

        from vid_dup_finder_lib_spark.operators.components import (
            cluster_size_histogram,
        )
        from vid_dup_finder_lib_spark.operators.splits import (
            cluster_coherent_split,
        )

        spark = SparkSession.builder.appName(
            "vid-dup-finder-spark-report"
        ).getOrCreate()
        from pyspark.sql import functions as F

        groups = spark.read.parquet(
            os.path.join(args.checkpoint, "groups", "data")
        )
        assign = groups.select(
            F.col("id"), F.col("cluster_id").alias("component")
        )
        docs = spark.read.parquet(args.docs) if args.docs else None
        total = (
            docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
            if docs is not None
            else None
        )
        hist = cluster_size_histogram(assign, n_total_docs=total)
        hist.write.mode("overwrite").parquet(
            os.path.join(args.report, "sizes.parquet")
        )
        out = {"report": args.report, "histogram_rows": hist.count()}
        if docs is not None:
            splits = cluster_coherent_split(
                docs.select(F.col(args.id_col)),
                assign,
                [("train", 800_000), ("val", 100_000), ("test", 100_000)],
                id_col=args.id_col,
            )
            splits.write.mode("overwrite").parquet(
                os.path.join(args.report, "splits.parquet")
            )
            out["split_rows"] = splits.count()
        print(json.dumps(out, indent=2))
        return 0

    if args.merge_with:
        import os

        from vid_dup_finder_lib_spark import api
        from vid_dup_finder_lib_spark.plans.sigstore import (
            PartitionedSignatureStore,
        )

        spark = SparkSession.builder.appName(
            "vid-dup-finder-spark-merge"
        ).getOrCreate()
        from pyspark.sql import functions as F

        if (
            args.canonicalize_urls
            or args.strip_boilerplate
            or args.dedup_paragraphs
            or args.dedup_spans
        ):
            raise SystemExit(
                "--merge-with supports per-doc preprocessing only: the "
                "corpus-GLOBAL stages (URL revisit collapse, boilerplate "
                "df counts, first-wins paragraph/span dedup) would have "
                "picked different survivors on the union corpus than on "
                "each shard — rerun the full pipeline over the union.  "
                "Per-doc stages (--quality-gate, --decontam) compose and "
                "are fine"
            )

        def _open_shard(root: str):
            groups = spark.read.parquet(os.path.join(root, "groups", "data"))
            if "is_seed" in groups.columns:
                raise SystemExit(
                    f"--merge-with supports cc grouping only: {root} holds "
                    "matchset-mode groups (greedy order-sensitive; no merge "
                    "algebra exists) — rerun the full pipeline over the union"
                )
            store = PartitionedSignatureStore(
                os.path.join(root, "signatures"),
                DEFAULT_CONFIG,
                extra_fingerprint=_flag_extras(args),
            )
            return store, groups.select(
                F.col("id"), F.col("cluster_id").alias("component")
            )

        store_a, prev_a = _open_shard(args.checkpoint)
        store_b, prev_b = _open_shard(args.merge_with)
        assignment = api.search_merge(
            store_a,
            prev_a,
            store_b,
            prev_b,
            tolerance=args.tolerance,
            cfg=DEFAULT_CONFIG,
            update_store=args.incremental_commit,
        )
        out = assignment.select(
            F.col("component").alias("cluster_id"), "id"
        ).localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({
            "merged_with": args.merge_with,
            "assigned_rows": out.count(),
            "store_committed": bool(args.incremental_commit),
        }, indent=2))
        return 0

    if args.incremental_add:
        import os

        from vid_dup_finder_lib_spark import api
        from vid_dup_finder_lib_spark.plans.sigstore import (
            PartitionedSignatureStore,
        )

        spark = SparkSession.builder.appName(
            "vid-dup-finder-spark-incremental"
        ).getOrCreate()
        from pyspark.sql import functions as F

        if (
            args.canonicalize_urls
            or args.strip_boilerplate
            or args.quality_gate
            or args.dedup_paragraphs
            or args.dedup_spans
        ):
            raise SystemExit(
                "--incremental-add supports the raw-docs pipeline only: the "
                "preprocessing stages (canonicalize/strip/quality/paragraph/"
                "span dedup) are CORPUS-GLOBAL and cannot be replayed on an "
                "isolated batch — rerun the full pipeline (its signature "
                "stage is already O(delta))"
            )
        groups_path = os.path.join(args.checkpoint, "groups", "data")
        prev_groups = spark.read.parquet(groups_path)
        if "is_seed" in prev_groups.columns:
            raise SystemExit(
                "--incremental-add supports cc grouping only: the stored "
                "groups stage is matchset-mode (greedy order-sensitive; "
                "no incremental merge exists) — rerun the full pipeline"
            )
        # the store validates its fingerprint on exists()/read(): pass the
        # SAME flag-derived extras the pipeline run used, so a mismatched
        # invocation (different strip/gate flags) fails fast instead of
        # folding into a semantically different corpus
        sigstore = PartitionedSignatureStore(
            os.path.join(args.checkpoint, "signatures"),
            DEFAULT_CONFIG,
            extra_fingerprint=_flag_extras(args),
        )
        prev = prev_groups.select(
            F.col("id"), F.col("cluster_id").alias("component")
        )
        new_docs = spark.read.parquet(args.incremental_add)
        if args.extract_html:
            # per-doc like decontam: the frozen extractor replays exactly
            # on an isolated batch (text is a pure function of the row's
            # own html), so extraction-built checkpoints stay consistent
            # under incremental folds
            from vid_dup_finder_lib_spark.extraction import extract_text_col

            if args.text_col in new_docs.columns:
                # eqNullSafe: plain == is NULL for null-vs-non-null rows
                # and where() drops them, silently passing the gate
                bad = new_docs.withColumn(
                    "__ext", extract_text_col(F.col(args.html_col))
                ).where(
                    ~F.col(args.text_col).eqNullSafe(F.col("__ext"))
                ).count()
                if bad:
                    raise SystemExit(
                        f"--extract-html: {bad} batch rows violate "
                        f"{args.text_col} == extract({args.html_col})"
                    )
                new_docs = new_docs.drop(args.html_col)
            else:
                new_docs = new_docs.withColumn(
                    args.text_col, extract_text_col(F.col(args.html_col))
                ).drop(args.html_col)
        if args.decontam:
            # decontam is per-doc vs a BROADCAST benchmark — unlike the
            # corpus-global strips it replays exactly on a batch, so a
            # decontam-built checkpoint stays semantically consistent
            from vid_dup_finder_lib_spark.operators.decontam import (
                benchmark_contamination,
            )

            bench = spark.read.parquet(args.decontam)
            flags = benchmark_contamination(
                new_docs, bench, n=args.decontam_ngram,
                id_col=args.id_col, text_col=args.text_col,
                bench_id_col=bench.columns[0],
                bench_text_col=("text" if "text" in bench.columns
                                else bench.columns[-1]),
            )
            new_docs = new_docs.join(
                flags.where(~F.col("contaminated")).select(args.id_col),
                args.id_col,
                "left_semi",
            )
        assignment = api.search_incremental(
            new_docs,
            sigstore,
            prev,
            tolerance=args.tolerance,
            cfg=DEFAULT_CONFIG,
            id_col=args.id_col,
            text_col=args.text_col,
            update_store=args.incremental_commit,
            unit=args.signature_unit,
        )
        out = assignment.select(
            F.col("component").alias("cluster_id"), "id"
        ).localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({
            "incremental_add": args.incremental_add,
            "assigned_rows": out.count(),
            "store_committed": bool(args.incremental_commit),
        }, indent=2))
        return 0

    if args.incremental_delete:
        import os

        from vid_dup_finder_lib_spark import api
        from vid_dup_finder_lib_spark.plans.sigstore import (
            PartitionedSignatureStore,
        )

        spark = SparkSession.builder.appName(
            "vid-dup-finder-spark-incremental"
        ).getOrCreate()
        from pyspark.sql import functions as F

        groups_path = os.path.join(args.checkpoint, "groups", "data")
        prev_groups = spark.read.parquet(groups_path)
        if "is_seed" in prev_groups.columns:
            raise SystemExit(
                "--incremental-delete supports cc grouping only: the stored "
                "groups stage is matchset-mode (greedy order-sensitive; "
                "no incremental merge exists) — rerun the full pipeline"
            )
        sigstore = PartitionedSignatureStore(
            os.path.join(args.checkpoint, "signatures"),
            DEFAULT_CONFIG,
            extra_fingerprint=_flag_extras(args),
        )
        prev = prev_groups.select(
            F.col("id"), F.col("cluster_id").alias("component")
        )
        dels = spark.read.parquet(args.incremental_delete)
        assignment = api.search_delete(
            dels,
            sigstore,
            prev,
            tolerance=args.tolerance,
            cfg=DEFAULT_CONFIG,
            keep_isolated=True,
            update_store=args.incremental_commit,
        )
        out = assignment.select(
            F.col("component").alias("cluster_id"), "id"
        ).localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({
            "incremental_delete": args.incremental_delete,
            "assigned_rows": out.count(),
            "store_committed": bool(args.incremental_commit),
        }, indent=2))
        return 0

    spark = SparkSession.builder.appName("vid-dup-finder-spark-job").getOrCreate()
    docs = spark.read.parquet(args.docs)
    confirmed = spark.read.parquet(args.confirmed) if args.confirmed else None
    falsepos = spark.read.parquet(args.falsepos) if args.falsepos else None

    res = run_dedup_pipeline(
        spark,
        docs,
        args.checkpoint,
        tolerance=args.tolerance,
        cfg=DEFAULT_CONFIG,
        grouping=args.grouping,
        confirmed=confirmed,
        falsepos=falsepos,
        id_col=args.id_col,
        text_col=args.text_col,
        ts_col=args.ts_col,
        force=args.force,
        canonicalize_urls=args.canonicalize_urls,
        strip_boilerplate=args.strip_boilerplate,
        boilerplate_min_df=tuple(int(x) for x in args.boilerplate_min_df.split("/")),
        quality_gate=args.quality_gate,
        quality_min_tokens=args.quality_min_tokens,
        dedup_paragraphs=args.dedup_paragraphs,
        paragraph_line_tokens=args.paragraph_line_tokens,
        dedup_spans=args.dedup_spans,
        span_k=args.span_k,
        decontam_docs=(
            spark.read.parquet(args.decontam) if args.decontam else None
        ),
        decontam_ngram=args.decontam_ngram,
        reload_errors=args.reload_errs,
        extract_html=args.extract_html,
        html_col=args.html_col,
        signature_unit=args.signature_unit,
    )
    if args.output:
        if args.output_format == "json":
            # one JSON object per group, members sorted — the reference's
            # JSON output shape (search_output.rs:95-110)
            from pyspark.sql import functions as F

            grouped = res.groups.groupBy("cluster_id").agg(
                F.sort_array(F.collect_list("id")).alias("members")
            )
            grouped.write.mode("overwrite").json(args.output)
        else:
            res.groups.write.mode("overwrite").parquet(args.output)
    if args.sweep_tolerances:
        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.operators.components import (
            radius_sweep_components,
        )

        run_tol = (
            args.tolerance
            if args.tolerance is not None
            else DEFAULT_CONFIG.default_tolerance
        )
        tols = [float(x) for x in args.sweep_tolerances.split(",")]
        too_loose = [t for t in tols if t > run_tol]
        if too_loose:
            raise SystemExit(
                f"--sweep-tolerances levels {too_loose} exceed the run "
                f"tolerance {run_tol}: the edge set was verified at radius "
                f"{DEFAULT_CONFIG.radius(run_tol)} and holds no looser "
                "pairs — re-run the pipeline at the loosest level instead"
            )
        sweep = radius_sweep_components(
            res.edges, [DEFAULT_CONFIG.radius(t) for t in tols]
        )
        sweep.select(
            "radius", F.col("component").alias("cluster_id"), "id"
        ).write.mode("overwrite").parquet(args.output + "_sweep")
    if args.output_unique:
        from vid_dup_finder_lib_spark.operators.matchdb import unique_docs

        unique_docs(docs, res.edges, id_col=args.id_col).select(args.id_col).write.mode(
            "overwrite"
        ).parquet(args.output_unique)
    if args.emit_corpus:
        # the END PRODUCT: one survivor per near-dup cluster + every
        # unmatched doc, with the PIPELINE-processed text (res.docs — the
        # text the signatures were actually built over, after extraction/
        # strips/gates/rewrites), packed into token-budget shards with a
        # durable manifest.  Deterministic: survivor = min member id,
        # shard order = id order.
        import os

        from pyspark.sql import functions as F

        from vid_dup_finder_lib_spark.functions.textstats import (
            whitespace_token_count,
        )
        from vid_dup_finder_lib_spark.operators.dedup import neardup_survivors
        from vid_dup_finder_lib_spark.operators.packing import pack_shards

        if "is_seed" in res.groups.columns:
            # matchset groups are DISJOINT by construction (the greedy
            # consume marks every member matched — grouping.py: "every
            # video lands in at most one group"), so the export is a
            # partition already; the min-cluster_id claim below is a
            # structural guarantee of that invariant (and the documented
            # export rule should any future grouping emit overlap: each
            # doc is claimed by its minimum cluster_id, exported once).
            cc = res.groups.groupBy("id").agg(
                F.min("cluster_id").alias("cluster_id")
            )
        else:
            cc = res.groups.select("id", "cluster_id")
        if args.survivor_rule == "medoid":
            from vid_dup_finder_lib_spark.operators.dedup import (
                medoid_survivors,
            )
            from vid_dup_finder_lib_spark.operators.verify import (
                attach_signatures,
                with_distances,
            )

            # the pipeline's edge stage verifies by tolerance radius and
            # carries no Jaccard counts; attach shingle arrays from the
            # signatures stage HERE (medoid-only cost — every other run
            # keeps the lean edge schema)
            scored = with_distances(
                attach_signatures(
                    res.edges.select("id1", "id2"),
                    res.signatures,
                    need_shingles=True,
                    need_tokens=False,
                )
            ).select("id1", "id2", "inter_count", "union_count")
            med = medoid_survivors(
                cc, scored, member_col="id", cluster_col="cluster_id"
            )
            clustered = med.select(
                F.col("survivor_id").alias("__sid"),
                F.col("n_members").alias("cluster_size"),
            )
            singles = (
                res.docs.select(F.col(args.id_col).alias("__sid"))
                .join(cc.select(F.col("id").alias("__sid")), "__sid", "left_anti")
                .select("__sid", F.lit(1).cast("long").alias("cluster_size"))
            )
            surv = clustered.unionByName(singles)
        elif args.survivor_rule == "quality":
            from vid_dup_finder_lib_spark.operators.dedup import (
                priority_survivors,
            )

            # score = whitespace token count of the PIPELINE-processed
            # text (res.docs — same text the export ships), i.e. keep the
            # longest surviving extraction of each page; ties -> min id
            scored_docs = res.docs.select(
                F.col(args.id_col),
                F.coalesce(
                    whitespace_token_count(F.col(args.text_col)), F.lit(0)
                ).cast("long").alias("__q"),
            )
            surv = priority_survivors(
                scored_docs, cc, score_col="__q",
                id_col=args.id_col, member_col="id",
                cluster_col="cluster_id",
            ).select(
                F.col(args.id_col).alias("__sid"), "cluster_size"
            )
        else:
            surv = neardup_survivors(
                res.docs, cc, id_col=args.id_col, member_col="id",
                cluster_col="cluster_id",
            ).withColumnRenamed(args.id_col, "__sid")
        kept = res.docs.join(
            surv, F.col(args.id_col) == F.col("__sid")
        ).drop("__sid")
        weighted = kept.withColumn(
            "n_tokens",
            F.coalesce(
                whitespace_token_count(F.col(args.text_col)), F.lit(0)
            ).cast("long"),
        )
        packed = pack_shards(
            weighted, args.shard_tokens, order_col=args.id_col,
            weight_col="n_tokens",
        ).localCheckpoint(eager=True)
        packed.write.mode("overwrite").partitionBy("shard_id").parquet(
            os.path.join(args.emit_corpus, "data")
        )
        agg = packed.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
            (F.coalesce(F.max("shard_id"), F.lit(-1)) + 1).alias("n_shards"),
        ).collect()[0]
        manifest = {
            "n_docs": agg["n_docs"],
            "n_tokens": agg["n_tokens"],
            "n_shards": agg["n_shards"],
            "shard_token_budget": args.shard_tokens,
            "survivor_rule": {
                "medoid": "medoid (max incident edge mass) per cluster + singletons",
                "quality": "max processed-token count per cluster (ties min id) + singletons",
                "min-id": "min member id per cluster + singletons",
            }[args.survivor_rule],
        }
        with open(os.path.join(args.emit_corpus, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        print(json.dumps({"emit_corpus": manifest}, indent=2))
    print(json.dumps({k: {kk: m[kk] for kk in ("row_count", "wall_seconds")}
                      for k, m in res.metrics.items() if "row_count" in m}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
