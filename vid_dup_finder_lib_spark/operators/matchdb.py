"""Persistent match DB semantics: confirmed / false-positive pair tables.

The reference app keeps two on-disk structures (``vid_dup_finder_app/src/app/
match_db.rs``): a union-find of *confirmed* duplicates plus a symmetric
*false-positive* pair set, and filters every search result against them.
Here both are plain pair DataFrames (``url1 < url2`` normalized — the
reference inserts both directions, match_db.rs:146-166; we canonicalize
instead) and every filter is a join:

* falsepos removal (J7) — anti-join the *edge* table before clustering;
  removing edges pre-CC is the scalable equivalent of the reference's greedy
  group-member dropping (app_fns.rs:573-594);
* known-match filtering (J6) — drop found pairs already confirmed, re-cluster
  the residual (app_fns.rs:532-565);
* missed-match recall (J8) — ``confirmed − found`` (app_fns.rs:655-698);
  recall = 1 − missed/confirmed is the BASELINE.json ≥0.99 gate;
* moved-file relink (J5) — equi-join on content hash (match_db.rs:709-758);
* unique output (J9) — docs with no duplicate (app_fns.rs:272-299);
* validation intersection — confirmed ∧ falsepos, the reference's one
  ``todo!()`` (match_db.rs:271-284), trivial here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.components import connected_components


def normalize_pairs(pairs: DataFrame, c1: str = "id1", c2: str = "id2") -> DataFrame:
    """Canonical (least, greatest) ordering so pair joins are exact."""
    return pairs.select(
        F.least(F.col(c1), F.col(c2)).alias("id1"),
        F.greatest(F.col(c1), F.col(c2)).alias("id2"),
    ).distinct()


def remove_falsepos_edges(edges: DataFrame, falsepos: DataFrame) -> DataFrame:
    """J7: drop false-positive pairs from the edge table *before* CC, so a
    falsepos edge can never merge two clusters."""
    return edges.join(normalize_pairs(falsepos), ["id1", "id2"], "left_anti")


def confirmed_clusters(confirmed: DataFrame) -> DataFrame:
    """Confirmed pairs -> (id, confirmed_cluster): the union-find's
    equivalence classes, rebuilt from the persisted pair list exactly as the
    reference rebuilds MatchMap on load (match_db.rs:480-492)."""
    return connected_components(normalize_pairs(confirmed)).withColumnRenamed(
        "component", "confirmed_cluster"
    )


def is_confirmed_pair(pairs: DataFrame, confirmed: DataFrame) -> DataFrame:
    """F7: adds boolean ``confirmed``: both ends in the same confirmed class."""
    cl = confirmed_clusters(confirmed)
    p = normalize_pairs(pairs)
    j = (
        p.join(cl.select(F.col("id").alias("id1"), F.col("confirmed_cluster").alias("c1")), "id1", "left")
        .join(cl.select(F.col("id").alias("id2"), F.col("confirmed_cluster").alias("c2")), "id2", "left")
    )
    # three-valued logic: c1==c2 is NULL when either side is NULL, and
    # `true & null` stays NULL — lead with the null checks so the whole
    # predicate collapses to false (not NULL) for half-confirmed pairs.
    return j.select(
        "id1",
        "id2",
        (
            F.col("c1").isNotNull()
            & F.col("c2").isNotNull()
            & (F.col("c1") == F.col("c2"))
        ).alias("confirmed"),
    )


def remove_known_matches(edges: DataFrame, confirmed: DataFrame) -> DataFrame:
    """J6: drop edges whose pair is already confirmed; the caller re-clusters
    the residual edges (CC over what remains)."""
    flagged = is_confirmed_pair(edges.select("id1", "id2"), confirmed)
    keep = flagged.where(~F.col("confirmed")).select("id1", "id2")
    return edges.join(keep, ["id1", "id2"], "left_semi")


def missed_matches(found_pairs: DataFrame, confirmed: DataFrame) -> DataFrame:
    """J8: confirmed pairs the search failed to find."""
    return normalize_pairs(confirmed).join(
        normalize_pairs(found_pairs), ["id1", "id2"], "left_anti"
    )


def recall_metrics(found_pairs: DataFrame, confirmed: DataFrame) -> DataFrame:
    """One-row recall accounting (the BASELINE ≥0.99 gate)."""
    conf = normalize_pairs(confirmed)
    n_conf = conf.count()
    n_missed = missed_matches(found_pairs, confirmed).count()
    spark = found_pairs.sparkSession
    recall = 1.0 if n_conf == 0 else 1.0 - n_missed / n_conf
    return spark.createDataFrame(
        [(n_conf, n_missed, recall)], "confirmed_pairs long, missed_pairs long, recall double"
    )


def unique_docs(docs: DataFrame, edges: DataFrame, id_col: str = "url") -> DataFrame:
    """J9: docs that matched nothing."""
    dup_ids = (
        edges.select(F.col("id1").alias(id_col))
        .union(edges.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    return docs.join(dup_ids, id_col, "left_anti")


def fix_moved_ids(
    signatures: DataFrame, confirmed_entries: DataFrame
) -> DataFrame:
    """J5: relink ids that changed while content stayed identical.

    ``confirmed_entries``: (id, content_hash) as persisted with the confirmed
    DB (match_db.rs:56-62).  Returns (old_id, new_id) for entries whose
    content hash exists in the corpus under a different id.
    """
    live = signatures.select(F.col("id").alias("new_id"), "content_hash")
    gone = confirmed_entries.select(F.col("id").alias("old_id"), "content_hash").join(
        signatures.select(F.col("id").alias("old_id")), "old_id", "left_anti"
    )
    return gone.join(live, "content_hash").select("old_id", "new_id")


def validation_conflicts(confirmed: DataFrame, falsepos: DataFrame) -> DataFrame:
    """Pairs marked both confirmed and false-positive — the reference's
    declared-but-unimplemented validation view (match_db.rs:271-284)."""
    return normalize_pairs(confirmed).intersect(normalize_pairs(falsepos))
