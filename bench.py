"""Bench harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query sec),
"sf", plus docs/sec throughput of the end-to-end dedup pipeline}.

Session/JVM startup is excluded from timings (it is a fixed cost that
vanishes at cluster scale); each query timing includes its full plan
execution to a count/collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_suite(spark, entry, sf_dir: str) -> tuple[dict, float, int, float]:
    headline = [
        "signatures_basic",
        "exact_dup_groups",
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "connected_components",
        "simhash_pairs",
        "length_band_pairs",
        "refs_search",
        "ann_topk",
        "substring_pairs",
    ]
    qs = entry.queries()
    timings: dict[str, float] = {}
    t_total0 = time.time()
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # end-to-end pipeline throughput on the derived near-dup corpus
    from vid_dup_finder_lib_spark.operators.grouping import cc_groups
    from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures
    from vid_dup_finder_lib_spark.operators.verify import verified_edges

    derived = entry._derived_neardup(entry._docs(spark, sf_dir)).localCheckpoint(eager=True)
    n_docs = derived.count()
    t0 = time.time()
    sigs = build_signatures(derived, entry.ENTRY_CFG, id_col="doc_id", text_col="text")
    sigs = sigs.localCheckpoint(eager=True)
    pairs, _q = candidate_pairs(sigs, entry.ENTRY_CFG)
    edges = verified_edges(
        pairs, sigs, entry.ENTRY_CFG,
        jaccard_num_den=(entry.JACCARD_NUM, entry.JACCARD_DEN), length_band=False,
    ).localCheckpoint(eager=True)
    n_groups = cc_groups(edges).count()
    t_pipeline = round(time.time() - t0, 3)
    timings["pipeline_e2e"] = t_pipeline
    print(f"# pipeline: {n_docs} docs -> {n_groups} grouped in {t_pipeline}s", file=sys.stderr)
    return timings, round(time.time() - t_total0, 3), n_docs, t_pipeline


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # min-of-k trials: this shared host's co-tenant storms inflate identical
    # runs 2-5x for minutes at a time (see BENCH.md); back-to-back trials +
    # per-query min is the storm shield the scaling harness uses too
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry
    from vid_dup_finder_lib_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus, shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # one JSON line carrying BOTH min and median across trials: the min is
    # the storm-shielded number, the median shows what a typical run on this
    # host costs — the headline of record is whatever the driver captures
    # from this output, never a separately-run quiet-window figure
    from statistics import median

    all_timings: list[dict[str, float]] = []
    totals: list[float] = []
    best_total = None
    best_rate = None
    for t in range(trials):
        timings, total, n_docs, t_pipeline = run_suite(spark, entry, sf_dir)
        print(f"# trial {t + 1}/{trials}: {total}s", file=sys.stderr)
        all_timings.append(timings)
        totals.append(total)
        if best_total is None or total < best_total:
            best_total = total
            best_rate = round(n_docs / t_pipeline, 1)

    names = all_timings[0].keys()
    min_timings = {k: round(min(tt[k] for tt in all_timings), 3) for k in names}
    med_timings = {k: round(median(tt[k] for tt in all_timings), 3) for k in names}

    # round-3/4 operator families, timed OUTSIDE the legacy headline total
    # so "value" stays comparable across rounds (min of 2 back-to-back
    # runs); they graduate into the round-4 "value_v2" total below
    extra_names = [
        "url_canonical_dedup",
        "asof_view_before_click",
        "range_click_near_error",
        "sessionization",
        "event_window_rollup",
        "lsh_bucket_topk",
        "ivf_topk",
        "streamed_event_rollup",
        "streamed_sessions",
        "gopher_repetition",
        "contamination_scan",
        "shard_packing",
        "benchmark_decontam",
        "eval_coverage",
        "top_bigram_stats",
        "image_ahash_pairs",
        "audio_fp_pairs",
        "semantic_dedup",
        "repeated_line_strip",
        "domain_dup_stats",
        "streamed_dedup",
        "stratified_sample",
        "paragraph_dedup_rewrite",
        "neardup_survivors",
        "bloom_incremental_dedup",
        "corpus_mix_report",
        "streamed_neardup",
        "pair_line_diff",
        "containment_pairs",
        "doc_novelty",
        "frequent_line_topk",
        "cluster_purity",
        "corpus_redundancy_report",
        "incremental_cc",
        "merge_cc",
        "merge_many_cc",
        "incremental_delete_cc",
        "threshold_sweep_cc",
        "minhash_estimate_pairs",
        "hll_distinct_shingles",
        "pair_lcs",
        "pair_coverage",
        "split_leakage",
        "source_dedup_ledger",
        "compression_ratio",
        "medoid_survivors",
        "char_ngram_pairs",
        "jaccard_pairs_prefix_plan",
        "char_lsh_pairs",
        "paragraph_neardup",
        "source_overlap_matrix",
        "clustering_agreement",
        "cluster_size_histogram",
        # round-5 graduates: the blocked exact embedding join, the
        # char-unit incremental fold, the quality survivor rule, and the
        # corpus-level ExactSubstr span rewrite
        "embedding_neardup",
        "char_incremental_cc",
        "quality_dedup_survivors",
        "duplicate_span_rewrite",
        "duplicate_span_sources",
        "script_profile",
    ]
    qs = entry.queries()
    extras: dict[str, float] = {}
    # single pass by default: at 49 graduated extras a min-of-2 doubles
    # ~15 min of wall and risks the harness's bench timeout (the headline
    # keeps its min-of-2 storm shield; extras outliers are visible as such)
    extra_runs = int(os.environ.get("SPARK_GRAFT_EXTRA_RUNS", "1"))
    for name in extra_names:
        best = None
        for _ in range(extra_runs):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        extras[name] = round(best, 3)
        print(f"# extra {name}: {n} rows in {extras[name]}s", file=sys.stderr)

    out = {
        "metric": "dedup_bench_total",
        "value": best_total,
        "value_median": round(median(totals), 3),
        # round-4 headline: legacy total + the graduated operator families
        # ("value" alone stays the cross-round continuity number)
        "value_v2": round(best_total + sum(extras.values()), 3),
        "unit": "sec",
        "queries": min_timings,
        "queries_median": med_timings,
        "queries_extra": extras,
        "sf": sf,
        "cpus": cpus,
        "trials": trials,
        "pipeline_docs_per_sec": best_rate,
    }
    spark.stop()
    print(json.dumps(out))
    # re-emit the headline as a COMPACT final line: the driver's capture
    # keeps the tail of stdout, and the full record above grew big enough
    # (60+ per-query extras) that round 4's BENCH file lost the leading
    # "value" field to truncation.  This line carries every field the
    # driver contract requires and is short enough to never truncate;
    # a last-line parser gets the complete headline, a whole-output
    # parser still has the detail record above.
    print(json.dumps({
        "metric": out["metric"],
        "value": out["value"],
        "value_v2": out["value_v2"],
        "unit": out["unit"],
        "queries": min_timings,
        "sf": sf,
        "cpus": cpus,
        "pipeline_docs_per_sec": best_rate,
    }))


if __name__ == "__main__":
    main()
