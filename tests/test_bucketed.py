"""Bucketed signature table: the signatures side of the attach join must
read WITHOUT an Exchange (its bucket layout satisfies the join's required
partitioning); only the pair side shuffles.  Asserted on the physical
plan, not just on results."""

import pyspark.sql.functions as F
import pytest

from vid_dup_finder_lib_spark.plans.bucketed import (
    attach_bucketed,
    save_bucketed_signatures,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge/shuffled-hash joins so the Exchange count is the
    thing under test (broadcast would trivially have no exchange).
    Restore unsets keys that were unset before — setting a previously-
    unset key to its fallback would permanently pin it for the shared
    session (AQE broadcast conversion disabled for every later test)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, "-1")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bucketed_attach_join_is_shuffle_free_on_signatures(
    spark, tmp_path, no_broadcast
):
    sigs = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 97).alias("doclen"), F.sha2(F.col("id").cast("string"), 256).alias("content_hash")
    )
    save_bucketed_signatures(
        sigs, "sigs_bucketed_test", num_buckets=8, path=str(tmp_path / "tbl")
    )
    try:
        pairs = spark.range(0, 500).select(
            F.col("id").alias("id1"), (F.col("id") + 1000).alias("id2")
        )
        joined = attach_bucketed(
            pairs, spark, "sigs_bucketed_test", cols=["doclen"]
        )
        assert joined.count() == 500

        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        # signatures appear as bucketed file scans (zero exchanges on
        # their side)
        assert plan.count("Bucketed: true") >= 2, (
            "signature scans did not use the bucketed layout:\n" + plan[:2000]
        )
        # and the join needs strictly fewer exchanges than the three an
        # unbucketed double-join would take (pairs, s1, s2)
        assert n_exchanges <= 2, plan[:2000]
    finally:
        spark.sql("DROP TABLE IF EXISTS sigs_bucketed_test")


def test_bucketed_attach_values_correct(spark, tmp_path):
    sigs = spark.range(0, 100).select(F.col("id"), (F.col("id") * 2).alias("doclen"))
    save_bucketed_signatures(
        sigs, "sigs_bucketed_vals", num_buckets=4, path=str(tmp_path / "tbl2")
    )
    try:
        pairs = spark.createDataFrame([(3, 7), (10, 99)], "id1 long, id2 long")
        got = {
            (r.id1, r.id2): (r.doclen1, r.doclen2)
            for r in attach_bucketed(
                pairs, spark, "sigs_bucketed_vals", cols=["doclen"]
            ).collect()
        }
        assert got == {(3, 7): (6, 14), (10, 99): (20, 198)}
    finally:
        spark.sql("DROP TABLE IF EXISTS sigs_bucketed_vals")
