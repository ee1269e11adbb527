"""End-to-end pipeline soak: every round-2/3 feature load-bearing at once.

One run of run_dedup_pipeline with URL canonicalization (a planted crawl
revisit under a messy spelling would otherwise join its cluster as an
extra exact-dup member), boilerplate strip (without which the planted
mega-boilerplate quarantines every LSH bucket and recall collapses),
falsepos edge removal, confirmed-match regrouping, recall accounting, and
checkpoint resume — the full reference CLI surface (SURVEY.md §3.3) in one
integration pass.
"""

import pyspark.sql.functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators.matchdb import recall_metrics
from vid_dup_finder_lib_spark.plans.pipeline import run_dedup_pipeline


def test_pipeline_soak_all_features(spark, tmp_path):
    cb = CorpusBuilder(seed=91)
    clusters = cb.make_clusters(
        num_clusters=5, first_size=4, size_step=0, intra_d=20, inter_d=300, doclen=400
    )
    cb.add_singletons(40, 300, 500, site=8)
    docs = cb.to_spark(spark, partitions=4)
    # corpus-wide boilerplate block (~840 tokens vs 400 doc tokens): without
    # the strip it dominates every signature and the tight bucket cap
    # quarantines all candidates
    bp = "\n".join(
        f"nav boilerplate row {j} common to absolutely every page" for j in range(120)
    )
    docs = docs.withColumn(
        "text", F.concat(F.lit(bp + "\n"), F.col("text"))
    ).localCheckpoint()

    # crawl revisit: cluster[2][0] was ALSO captured a day earlier under a
    # messy spelling (host case, default port, tracking param, fragment)
    # with identical text — without canonicalize_urls it survives as an
    # extra exact-dup member of that cluster and the grouping assertion
    # fails; with it, the newest capture (the canonical spelling) wins
    victim = clusters[2][0]
    host_end = victim.index("/", len("https://"))
    messy = (
        "HTTPS://" + victim[len("https://"):host_end].upper() + ":443"
        + victim[host_end:] + "?utm_source=soak#top"
    )
    revisit = (
        docs.where(F.col("url") == victim)
        .withColumn("url", F.lit(messy))
        .withColumn("warc_ts", F.col("warc_ts") - F.expr("INTERVAL 1 DAY"))
    )
    docs = docs.unionByName(revisit).localCheckpoint()

    cfg = SigConfig(num_perms=128, lsh_bands=64, seed=42, max_bucket_size=8)
    c0, c1 = clusters[0], clusters[1]
    falsepos = spark.createDataFrame([(c1[0], c1[1])], "id1 string, id2 string")
    confirmed = spark.createDataFrame(
        [(a, b) for i, a in enumerate(c0) for b in c0[i + 1 :]],
        "id1 string, id2 string",
    )

    res = run_dedup_pipeline(
        spark,
        docs,
        str(tmp_path / "ckpt"),
        tolerance=0.100,
        cfg=cfg,
        grouping="cc",
        falsepos=falsepos,
        confirmed=confirmed,
        canonicalize_urls=True,
        strip_boilerplate=True,
    )

    # the messy revisit spelling must have been collapsed away (newest
    # capture per canonical URL wins; identical text either way)
    assert res.groups.where(F.col("id") == messy).count() == 0

    # grouping: cluster 0 is fully confirmed -> regrouped away; clusters 1-4
    # survive intact (the falsepos edge removal cannot split c1's complete
    # graph); singletons never appear
    members = {}
    for r in res.groups.collect():
        members.setdefault(r.cluster_id, set()).add(r.id)
    got_sets = {frozenset(v) for v in members.values()}
    assert got_sets == {frozenset(c) for c in clusters[1:]}

    # falsepos pair is gone from the edge table (pre-CC removal)
    fp_hits = res.edges.where(
        (F.col("id1") == min(c1[0], c1[1])) & (F.col("id2") == max(c1[0], c1[1]))
    ).count()
    assert fp_hits == 0

    # recall gate: every planted intra-cluster pair except the falsepos one
    planted = [
        (min(a, b), max(a, b))
        for cl in clusters
        for i, a in enumerate(cl)
        for b in cl[i + 1 :]
    ]
    planted = [p for p in planted if p != (min(c1[0], c1[1]), max(c1[0], c1[1]))]
    truth = spark.createDataFrame(planted, "id1 string, id2 string")
    m = recall_metrics(res.edges, truth).collect()[0]
    assert m.recall == 1.0 and m.confirmed_pairs == len(planted)

    # lineage metrics exist for every stage, incl. the round-2 strip stage
    assert {
        "docs_canonical", "docs_stripped", "signatures", "edges", "groups", "group_stats"
    } <= set(res.metrics)
    assert all("partition_rows" in v for v in res.metrics.values())

    # resume: a second invocation skips completed stages and reproduces the
    # same grouping from the checkpoint store
    res2 = run_dedup_pipeline(
        spark,
        docs,
        str(tmp_path / "ckpt"),
        tolerance=0.100,
        cfg=cfg,
        grouping="cc",
        falsepos=falsepos,
        confirmed=confirmed,
        canonicalize_urls=True,
        strip_boilerplate=True,
    )
    assert res2.groups.count() == res.groups.count()
