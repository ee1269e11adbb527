"""Iterative connected components over an edge DataFrame.

Replaces the reference's driver-side union-find
(``vid_dup_finder_app/src/app/disjoint_set.rs:8-124``) with a distributed
min-label propagation loop (the alternating large-star/small-star family;
see BTS, ICDE 2024 in PAPERS.md).  Each iteration:

    label(v) <- min(label(v), min over neighbors u of label(u))

over symmetrized edges, with ``localCheckpoint()`` per round to cut lineage
(a Spark-specific must for iterative plans) and an exact changed-row count as
the convergence test.  Dup clusters are dense and shallow, so rounds ~
O(cluster diameter) ~ 2-4 in practice; the edge table — not driver memory —
is the only state, which is what lets this run at 10^12 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 50,
    rows_per_partition: int = 500_000,
) -> DataFrame:
    """edges (id1, id2) -> assignment (id, component) where component is the
    minimum member id of the node's component.

    Nodes only appear if they occur in an edge; isolated docs are handled by
    the caller (grouping.assign_clusters joins back to the full corpus).

    Partitioning: each iteration is a join + groupBy materialized by
    ``localCheckpoint`` — an action that runs *before* AQE can coalesce, so
    the loop would otherwise pay full shuffle-partition fan-out per round on
    an edge set that is typically tiny relative to the corpus.  The edge
    count (already needed for the empty check) sizes the loop's partitioning
    explicitly: ~rows_per_partition rows per partition, floor 1.
    """
    sym = (
        edges.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
        .union(edges.select(F.col(id2).alias("src"), F.col(id1).alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    n_edges = sym.count()
    spark = edges.sparkSession
    default_par = spark.sparkContext.defaultParallelism
    npart = int(max(1, min(default_par * 2, n_edges // rows_per_partition + 1)))
    if npart < sym.rdd.getNumPartitions():
        sym = sym.repartition(npart, "dst").localCheckpoint(eager=True)

    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("min_dst"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("min_dst"), F.col("src")).alias("component"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.where("_changed").limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels
