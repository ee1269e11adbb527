"""--sweep-tolerances: per-level clusterings emitted from one pipeline run
must equal fresh pipeline runs at those tolerances (same edge set, filter +
CC only); looser-than-run levels refuse."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.plans import job


def _chain_corpus(spark):
    """{a,a2} -- b -- {c,c2}: intra-wing distance 20, wing-to-bridge 60/80,
    cross-wing 120+ — so radius 100 gives one component, radius 50 gives
    exactly the two wings."""
    cb = CorpusBuilder(seed=88)
    base = cb.base_tokens(800)
    a = cb.member_at_distance(base, 60)
    c = cb.member_at_distance(base, 60)
    cb.add_doc("https://chain.example/a", a)
    cb.add_doc("https://chain.example/a2", cb.member_at_distance(a, 20))
    cb.add_doc("https://chain.example/b", base)
    cb.add_doc("https://chain.example/c", c)
    cb.add_doc("https://chain.example/c2", cb.member_at_distance(c, 20))
    return cb.to_spark(spark, partitions=2).localCheckpoint(eager=True)


def test_radius_sweep_operator(spark):
    from vid_dup_finder_lib_spark.operators.components import (
        connected_components,
        radius_sweep_components,
    )

    edges = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 40), (3, 4, 90)],
        "id1 long, id2 long, token_hamming long",
    )
    out = {
        (r["radius"], r["id"]): r["component"]
        for r in radius_sweep_components(edges, [100, 50, 20]).collect()
    }
    assert [out[(100, i)] for i in (1, 2, 3, 4)] == [1, 1, 1, 1]
    assert [out[(50, i)] for i in (1, 2, 3)] == [1, 1, 1] and (50, 4) not in out
    assert [out[(20, i)] for i in (1, 2)] == [1, 1] and (20, 3) not in out
    # each level equals plain CC over the filtered edges
    for r in (100, 50, 20):
        want = {
            row["id"]: row["component"]
            for row in connected_components(
                edges.where(F.col("token_hamming") <= r)
            ).collect()
        }
        got = {i: c for (rad, i), c in out.items() if rad == r}
        assert got == want
    with pytest.raises(ValueError, match="radius"):
        radius_sweep_components(edges, [])


def test_job_cli_sweep_equals_fresh_runs(spark, tmp_path):
    docs = _chain_corpus(spark)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)

    out = str(tmp_path / "groups")
    assert job.main([
        "--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt"),
        "--tolerance", "0.100", "--output", out,
        "--sweep-tolerances", "0.100,0.050",
    ]) == 0
    sweep = spark.read.parquet(out + "_sweep")
    by_level = {
        r_: {
            (row["cluster_id"], row["id"])
            for row in sweep.where(F.col("radius") == r_).collect()
        }
        for r_ in (100, 50)
    }
    # level 100 == the run's own groups
    run_groups = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(out).collect()
    }
    assert by_level[100] == run_groups
    # level 50 == a fresh pipeline run at 0.050
    out2 = str(tmp_path / "groups50")
    assert job.main([
        "--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt50"),
        "--tolerance", "0.050", "--output", out2,
    ]) == 0
    fresh = {
        (r["cluster_id"], r["id"]) for r in spark.read.parquet(out2).collect()
    }
    assert by_level[50] == fresh
    # the wings actually split at 50 (2 clusters) vs one component at 100
    assert len({c for c, _ in by_level[50]}) == 2
    assert len({c for c, _ in by_level[100]}) == 1

    # looser-than-run levels refuse
    with pytest.raises(SystemExit, match="exceed"):
        job.main([
            "--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.100", "--output", out,
            "--sweep-tolerances", "0.200",
        ])
