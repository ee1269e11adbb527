"""Physical-plan assertions for round-4 operators — the plan claims in
PLANS.md pinned by tests, not prose.

These parse `.explain("formatted")` output.  Brittle against Spark
versions in principle, but the asserted properties (a broadcast join
present, NO vector-typed exchange, no single-partition window) are the
load-bearing scale properties — if an upgrade breaks the string match,
the right response is to re-audit the plan, which is the point.
"""

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontam_benchmark_side_is_broadcast(spark):
    """The benchmark n-gram set must broadcast: the training side streams
    map-side through the contamination join, never shuffling on the n-gram
    hash (eval corpora are tiny; training corpora are the 10^12 side)."""
    from vid_dup_finder_lib_spark.operators.decontam import benchmark_contamination

    train = spark.createDataFrame(
        [(i, "some words " * 20) for i in range(50)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "bench words " * 20)], "doc_id long, text string"
    )
    plan = _plan(benchmark_contamination(train, bench, n=13))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the training->match join on ngram_md5 must not hash-partition the
    # training explode: no Exchange keyed on the ngram hash column
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "ngram_md5" not in line, line


def test_lsh_topk_vectors_attach_after_distinct(spark):
    """PLANS.md §4b: the candidate path (bucket join + cross-table
    distinct) shuffles bare id pairs; vectors ship through EXACTLY the two
    attach-join exchanges (q-side, n-side) — once per surviving pair,
    never per candidate-bucket row.  With multi-probe the property must
    still hold (probe keys are id+int+long rows only)."""
    from vid_dup_finder_lib_spark.operators.ann import lsh_bucket_topk

    df = spark.createDataFrame(
        [(i, [float((i * j) % 7) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()
    plan = _plan(lsh_bucket_topk(df, k=3, dim=8, n_tables=4, n_planes=6, seed=1, n_probes=2))
    # walk the node descriptions: each "(N) NodeName" header, then its
    # Input/Arguments lines; collect shuffle-exchange nodes carrying vectors
    vec_exchanges = []
    bucket_exchange_has_vector = False
    cur = None
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith("(") and ") " in stripped[:7]:
            cur = stripped
        if cur and "Exchange" in cur and "Broadcast" not in cur and "Input" in line:
            if "qv" in line or "cv" in line or "embedding" in line:
                vec_exchanges.append((cur, line.strip()[:120]))
            if "bucket" in line:
                bucket_exchange_has_vector = (
                    bucket_exchange_has_vector or "embedding" in line
                )
    # the bucket-key candidate exchange never carries vectors
    assert not bucket_exchange_has_vector
    # vectors ride only the attach shape: the two per-ID side inputs plus
    # the per-PAIR shuffle carrying qv to meet cv (exactly one vector per
    # surviving pair) — never the per-candidate-bucket-row explode
    assert len(vec_exchanges) <= 3, vec_exchanges
    for _node, line in vec_exchanges:
        assert "bucket" not in line and "table_id" not in line, line


def test_pack_shards_no_global_window(spark):
    """The packing plan must contain no single-partition window: every
    Window node partitions by the range-partition id."""
    from vid_dup_finder_lib_spark.operators.packing import pack_shards

    df = spark.createDataFrame(
        [(i, i % 10 + 1) for i in range(200)], "doc_id long, n_tokens long"
    ).repartition(8)
    plan = _plan(pack_shards(df, budget=50))
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "_pid" in line, f"unpartitioned window: {line}"


def test_strip_frequent_lines_frequent_set_is_broadcast(spark):
    """The frequent-line set must broadcast into the strip's anti-join:
    the full line stream shuffles only for the df count / reassembly
    (both keyed small), never hash-partitioned on the line for the strip
    itself."""
    from vid_dup_finder_lib_spark.operators.boilerplate import strip_frequent_lines

    lined = spark.createDataFrame(
        [(i, ["line a", f"own {i}", "line b"]) for i in range(40)],
        "doc_id long, lines array<string>",
    )
    plan = _plan(strip_frequent_lines(lined, min_df=3))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # LeftAnti variant specifically — the strip drops, never multiplies
    assert "LeftAnti" in plan


def test_eval_coverage_training_side_never_shuffles_on_ngram(spark):
    """Reverse decontam keeps the decontam scale shape: benchmark n-gram
    set broadcast, no Exchange keyed on the n-gram hash (the training
    explode is the 10^12 side)."""
    from vid_dup_finder_lib_spark.operators.decontam import eval_coverage

    train = spark.createDataFrame(
        [(i, "some words " * 20) for i in range(50)], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "bench words " * 20)], "doc_id long, text string"
    )
    plan = _plan(eval_coverage(train, bench, n=13))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "ngram_md5" not in line, line


def test_first_wins_dedup_winner_rule_is_join_free(spark):
    """PLANS.md §8: dedup_lines_first_wins computes the kept set as a pure
    min(struct) aggregation — the only join in the whole plan is the final
    spine restore (left join on the doc id).  A window-function or
    join-back formulation would show up here as a second join or a
    partitioned-by-line Window node concentrating hot lines."""
    from vid_dup_finder_lib_spark.operators.boilerplate import (
        dedup_lines_first_wins,
    )

    lined = spark.createDataFrame(
        [(1, ["a b", "c d"]), (2, ["c d", "e f"])],
        "doc_id long, lines array<string>",
    )
    plan = _plan(dedup_lines_first_wins(lined))
    assert plan.count("Join type:") == 1, plan
    assert "Window" not in plan


def test_bloom_probe_is_shuffle_free(spark):
    """PLANS.md §8: the Bloom membership probe is ONE map-side Arrow pass —
    scan -> pandas UDF -> filter, zero Exchange on the incoming side (the
    bitmap ships via broadcast variable, invisible to the plan)."""
    import numpy as np

    from vid_dup_finder_lib_spark.operators.membership import (
        bloom_build,
        bloom_candidates,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], "key long")
    words = bloom_build(df, "key", 1 << 10, 3)
    plan = _plan(bloom_candidates(df, "key", words, 1 << 10, 3))
    assert "Exchange" not in plan, plan


def test_agreement_plan_has_no_window_and_no_pair_explosion(spark):
    """PLANS.md §12: clustering_agreement is joins + aggregations only —
    the pair sets are never materialized, so the plan must contain NO
    Window, NO Generate (explode), and NO CartesianProduct."""
    from vid_dup_finder_lib_spark.operators.components import clustering_agreement

    a = spark.createDataFrame([(i, i // 3) for i in range(30)], "id long, component long")
    b = spark.createDataFrame([(i, i // 5) for i in range(25)], "id long, component long")
    plan = _plan(clustering_agreement(a, b))
    assert "Window" not in plan
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan


def test_hll_registers_aggregate_is_partial(spark):
    """PLANS.md §12: the register groupBy max must map-side combine — the
    plan shows partial_max before the exchange, so input rows never cross
    the shuffle (only <= 2^p register rows per group do)."""
    from vid_dup_finder_lib_spark.operators.sketch import hll_registers

    df = spark.createDataFrame(
        [("g", f"item{i}") for i in range(100)], "g string, k string"
    )
    plan = _plan(hll_registers(df, ["g"], F.col("k")))
    assert "partial_max" in plan, plan
    assert "Window" not in plan


def test_coverage_windows_are_pair_partitioned(spark):
    """PLANS.md §12: every window in pair_verbatim_coverage (island
    detection + interval sweep) is partitioned — no 'Window [...]' node
    without a partition spec (an unpartitioned window is a single-task
    funnel at corpus scale)."""
    from vid_dup_finder_lib_spark.operators.substring import pair_verbatim_coverage

    docs = spark.createDataFrame(
        [(1, [f"t{i}" for i in range(20)]), (2, [f"t{i}" for i in range(20)])],
        "doc_id long, toks array<string>",
    )
    pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    plan = _plan(pair_verbatim_coverage(pairs, docs, k=8))
    for line in plan.splitlines():
        # formatted plans print windows as: Arguments: [spec], [part], [order]
        if line.strip().startswith("Arguments:") and "windowspecdefinition" in line:
            assert "specifiedwindowframe" in line
    # cheaper + version-stable: the string form of an unpartitioned spec
    assert "windowspecdefinition(," not in plan.replace(" ", "")
