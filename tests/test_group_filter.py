"""F5 group-member filter (MatchGroupExt::filter, match_group_ext.rs:36-67)
and the O2 duration sort mode (search_output.rs:43-79)."""

import pyspark.sql.functions as F

from vid_dup_finder_lib_spark.operators.grouping import (
    filter_groups,
    group_stats,
    sort_groups,
)


def _groups(spark, rows, with_ref=False):
    schema = "cluster_id long, id long" + (", is_seed boolean" if with_ref else "")
    return spark.createDataFrame(rows, schema)


def test_filter_dissolves_small_groups(spark):
    g = _groups(
        spark,
        [(1, 1), (1, 2), (1, 3), (4, 4), (4, 5), (6, 6), (6, 7), (6, 8)],
    )
    out = filter_groups(g, ~F.col("id").isin(2, 4))
    got = {(r.cluster_id, r.id) for r in out.collect()}
    # cluster 1 keeps [1,3] (>=2 -> survives); cluster 4 keeps only [5]
    # (<2 -> dissolved); cluster 6 untouched
    assert got == {(1, 1), (1, 3), (6, 6), (6, 7), (6, 8)}


def test_filter_ref_excluded_dissolves_group(spark):
    g = _groups(
        spark,
        [
            (1, 1, True), (1, 2, False), (1, 3, False),   # ref dropped
            (4, 4, True), (4, 5, False), (4, 6, False),   # dup dropped, survives
            (7, 7, True), (7, 8, False),                  # all dups dropped
        ],
        with_ref=True,
    )
    out = filter_groups(g, ~F.col("id").isin(1, 5, 8), ref_col="is_seed")
    got = {(r.cluster_id, r.id) for r in out.collect()}
    # cluster 1: reference excluded => whole group dissolves even though two
    # duplicates remain (match_group.rs:35-47 invariant); cluster 4 keeps
    # ref + one dup; cluster 7 has no dups left => dissolves
    assert got == {(4, 4), (4, 6)}


def test_duration_sort_mode(spark):
    groups = _groups(spark, [(1, 1), (1, 2), (3, 3), (3, 4), (5, 5), (5, 6)])
    edges = spark.createDataFrame(
        [(1, 2, 10), (3, 4, 30), (5, 6, 20)], "id1 long, id2 long, token_hamming long"
    )
    sigs = spark.createDataFrame(
        [(1, 100), (2, 90), (3, 500), (4, 480), (5, 250), (6, 260)],
        "id long, doclen long",
    )
    stats = group_stats(groups, edges, signatures=sigs)
    by_dur = [r.cluster_id for r in sort_groups(stats, "duration").collect()]
    assert by_dur == [3, 5, 1]  # max_doclen 500, 260, 100
    by_dur_asc = [
        r.cluster_id for r in sort_groups(stats, "duration", descending=False).collect()
    ]
    assert by_dur_asc == [1, 5, 3]
    # the two pre-existing modes still work with the extended stats frame
    by_dist = [r.cluster_id for r in sort_groups(stats, "max_distance").collect()]
    assert by_dist == [3, 5, 1]


def test_duration_sort_requires_max_doclen_and_orders_nulls_last(spark):
    """mode='duration' without signatures-built stats raises a clear error
    (not an AnalysisException deep in the plan); groups whose members are all
    error rows (null doclen -> null max_doclen) sort last in BOTH directions."""
    import pytest

    groups = _groups(spark, [(1, 1), (1, 2), (3, 3), (3, 4)])
    edges = spark.createDataFrame(
        [(1, 2, 10), (3, 4, 30)], "id1 long, id2 long, token_hamming long"
    )
    stats_no_sigs = group_stats(groups, edges)  # no signatures -> no max_doclen
    with pytest.raises(ValueError, match="max_doclen"):
        sort_groups(stats_no_sigs, "duration")

    # cluster 3's members have null doclen (error rows)
    sigs = spark.createDataFrame(
        [(1, 100), (2, 90), (3, None), (4, None)], "id long, doclen long"
    )
    stats = group_stats(groups, edges, signatures=sigs)
    assert [r.cluster_id for r in sort_groups(stats, "duration").collect()] == [1, 3]
    assert [
        r.cluster_id for r in sort_groups(stats, "duration", descending=False).collect()
    ] == [1, 3]


def test_matchset_mega_component_guard(spark):
    """A component above max_component_edges raises (never a silent OOM or
    wrong answer); cc mode remains the documented fallback."""
    import pytest

    from vid_dup_finder_lib_spark.operators.grouping import matchset_groups

    edges = spark.createDataFrame(
        [(i, i + 1, 100, 100) for i in range(30)],
        "id1 long, id2 long, len1 long, len2 long",
    )
    with pytest.raises(ValueError, match="max_component_edges"):
        matchset_groups(edges, max_component_edges=10).collect()
    # under the cap the same edges group fine
    assert matchset_groups(edges, max_component_edges=100).count() > 0
