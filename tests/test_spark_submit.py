"""The literal deliverable path: spark-submit --py-files <zip> job.py.

Everything else drives the pipeline in-process; this test ships the
packaged artifact through a REAL spark-submit child (own JVM, the package
importable only from the zip) and checks groups come out — the
north-rule's "run via spark-submit --py-files" verbatim."""

import json
import os
import shutil
import subprocess
import sys

import pytest


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from vid_dup_finder_lib_spark.corpus import CorpusBuilder

    docs_path = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "groups")

    cb = CorpusBuilder(seed=5)
    clusters = cb.make_clusters(
        num_clusters=2, first_size=3, size_step=0, intra_d=10, inter_d=300, doclen=300
    )
    cb.add_singletons(6, 250, 350, site=3)
    cb.to_spark(spark, partitions=2).write.parquet(docs_path)

    # build the --py-files artifact fresh
    zip_path = str(tmp_path / "pkg.zip")
    subprocess.run(
        [sys.executable, "/root/repo/tools/package.py", zip_path],
        check=True, capture_output=True,
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only way to import
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            "/root/repo/vid_dup_finder_lib_spark/plans/job.py",
            "--docs", docs_path,
            "--checkpoint", ckpt,
            "--tolerance", "0.1",
            "--output", out,
        ],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # the job printed per-stage lineage metrics as JSON
    metrics = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert "groups" in metrics and metrics["groups"]["row_count"] == 6

    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        got.setdefault(r.cluster_id, set()).add(r.id)
    assert {frozenset(v) for v in got.values()} == {frozenset(c) for c in clusters}
