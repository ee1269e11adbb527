"""medoid_survivors: most-central exemplar per cluster."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.dedup import medoid_survivors


def _cc(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "id1 long, id2 long, inter_count long, union_count long"
    )


def test_chain_cluster_picks_the_center(spark):
    # A(1)-B(2)-C(3) chain: B touches both edges -> B is the medoid,
    # while the min-id rule would keep the endpoint A
    cc = _cc(spark, [(1, 1), (2, 1), (3, 1)])
    edges = _edges(spark, [(1, 2, 1, 2), (2, 3, 1, 2)])
    row = medoid_survivors(cc, edges).collect()[0]
    assert row["survivor_id"] == 2
    assert row["n_members"] == 3
    assert row["survivor_score_ppm"] == 1_000_000  # 2 x 500000


def test_tie_breaks_to_smaller_id(spark):
    # symmetric triangle: all members have equal mass -> smallest id wins
    cc = _cc(spark, [(5, 5), (6, 5), (7, 5)])
    edges = _edges(
        spark, [(5, 6, 1, 2), (6, 7, 1, 2), (5, 7, 1, 2)]
    )
    row = medoid_survivors(cc, edges).collect()[0]
    assert row["survivor_id"] == 5


def test_mass_is_sum_of_incident_edge_quality(spark):
    # masses: doc1 = 200k+200k = 400k, doc2 = 900k, doc3 = 200k+900k =
    # 1.1M, doc4 = 200k -> doc 3 (touching the strong edge AND a weak one)
    # is the medoid; one strong edge alone (doc 2) is not enough
    cc = _cc(spark, [(1, 1), (2, 1), (3, 1), (4, 1)])
    edges = _edges(
        spark, [(1, 3, 1, 5), (1, 4, 1, 5), (2, 3, 9, 10)]
    )
    row = medoid_survivors(cc, edges).collect()[0]
    assert row["survivor_id"] == 3
    assert row["survivor_score_ppm"] == 1_100_000


def test_multiple_clusters_and_partitioning_invariance(spark):
    cc = _cc(spark, [(1, 1), (2, 1), (10, 10), (11, 10), (12, 10)])
    edges = _edges(
        spark, [(1, 2, 1, 2), (10, 11, 2, 5), (11, 12, 2, 5)]
    )
    a = {r["cluster_id"]: r["survivor_id"]
         for r in medoid_survivors(cc.repartition(1), edges.repartition(1)).collect()}
    b = {r["cluster_id"]: r["survivor_id"]
         for r in medoid_survivors(cc.repartition(8), edges.repartition(8)).collect()}
    assert a == b == {1: 1, 10: 11}
