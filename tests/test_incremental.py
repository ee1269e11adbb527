"""Incremental refresh semantics (FIXTURES.md §4 fx_incremental; reference
processing_fs_cache.rs:78-199): recompute exactly the changed/new ids, keep
unchanged signatures untouched, drop deleted ids; errors stay cached."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.operators.incremental import (
    plan_refresh,
    refresh_signatures,
)

CFG = SigConfig(seed=42)


@pytest.fixture(scope="module")
def versions(spark):
    cb = CorpusBuilder(seed=41)
    cb.add_singletons(40, 300, 600, site=2)
    v1 = cb.to_spark(spark).localCheckpoint()

    urls = sorted(r.url for r in v1.select("url").collect())
    changed = set(urls[:2])   # 5%: newer warc_ts + mutated text
    deleted = set(urls[2:4])  # 5%: dropped

    v2 = (
        v1.where(~F.col("url").isin(list(deleted)))
        .withColumn(
            "text",
            F.when(F.col("url").isin(list(changed)), F.concat("text", F.lit(" updated"))).otherwise(
                F.col("text")
            ),
        )
        .withColumn(
            "warc_ts",
            F.when(
                F.col("url").isin(list(changed)),
                F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"),
            ).otherwise(F.col("warc_ts")),
        )
    )
    nb = CorpusBuilder(seed=42)
    nb.add_singletons(2, 300, 600, site=3)  # 5% added
    v2 = v2.unionByName(nb.to_spark(spark, partitions=1)).localCheckpoint()
    return v1, v2, changed, deleted


def test_refresh_recomputes_exactly_the_delta(spark, versions):
    v1, v2, changed, deleted = versions
    cached = refresh_signatures(v1, None, CFG).localCheckpoint()
    to_compute, keep, del_ids = plan_refresh(v2, cached)
    got_compute = {r.url for r in to_compute.select("url").collect()}
    assert changed <= got_compute
    new_urls = {r.url for r in v2.join(v1, "url", "left_anti").select("url").collect()}
    assert got_compute == changed | new_urls
    assert {r.id for r in del_ids.collect()} == deleted
    # unchanged rows keep their cached signature rows untouched
    assert keep.count() == 40 - len(changed) - len(deleted)


def test_refreshed_table_is_consistent_with_full_rebuild(spark, versions):
    v1, v2, changed, deleted = versions
    cached = refresh_signatures(v1, None, CFG).localCheckpoint()
    refreshed = refresh_signatures(v2, cached, CFG).drop("cached_ts")
    rebuilt = refresh_signatures(v2, None, CFG).drop("cached_ts")
    a = {tuple(r) for r in refreshed.select("id", "doclen", "content_hash").collect()}
    b = {tuple(r) for r in rebuilt.select("id", "doclen", "content_hash").collect()}
    assert a == b


def test_reload_errors_flag(spark, versions):
    """Error rows are recomputed iff reload_errors is set (--reload-errs,
    video_hash_filesystem_cache.rs:160-166)."""
    v1, _, _, _ = versions
    urls = sorted(r.url for r in v1.select("url").collect())
    err_urls = set(urls[5:8])
    # plant 3 docs whose first build errored (2 tokens -> NotEnoughTokens)
    broken = v1.withColumn(
        "text",
        F.when(F.col("url").isin(list(err_urls)), F.lit("too short")).otherwise(
            F.col("text")
        ),
    )
    cached = refresh_signatures(broken, None, CFG).localCheckpoint()
    assert (
        cached.where(F.col("error").isNotNull()).count() == len(err_urls)
    )
    # the "source" got fixed but the timestamp did not move (a transient
    # extraction failure): default keeps the error cached, flag retries it
    to_default, _, _ = plan_refresh(v1, cached)
    assert to_default.count() == 0
    to_reload, _, _ = plan_refresh(v1, cached, reload_errors=True)
    assert {r.url for r in to_reload.select("url").collect()} == err_urls
    refreshed = refresh_signatures(v1, cached, CFG, reload_errors=True)
    assert refreshed.where(F.col("error").isNotNull()).count() == 0


def test_small_drift_does_not_recompute(spark, versions):
    v1, _, _, _ = versions
    cached = refresh_signatures(v1, None, CFG).localCheckpoint()
    drifted = v1.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 SECOND"))
    to_compute, keep, del_ids = plan_refresh(drifted, cached)
    # <=2s drift is within tolerance (processing_fs_cache.rs:181-192)
    assert to_compute.count() == 0
    assert keep.count() == 40
    assert del_ids.count() == 0
