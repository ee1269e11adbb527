"""SparkSession factory tuned for the dedup workload.

Scale posture (100 TB target, tested on local[N]):
* AQE on — runtime coalescing + skew-join splitting is the first line of
  defense against hot LSH buckets (SURVEY.md §4).
* Arrow on — every Python-side stage is pandas/Arrow vectorized; there is no
  per-row Python anywhere (BASELINE.json input_hint).
* shuffle partitions default to 2x cores locally; on a real cluster this is
  set per-job from input stats.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vid-dup-finder-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus * 2, 8)

    # one BLAS thread per task (guide §4.2 caveat): Spark schedules one
    # core per task, but OpenBLAS/MKL default to one thread PER CORE, so
    # every applyInPandas matmul task (gram matrix, ANN blocks, k-means
    # partials) spawns cpus threads and the stage runs cpus× oversubscribed
    # — measured 7.2 -> 5.4 s on the blocked Gram matmul at sf0.1.  Local
    # workers inherit the driver env; spark.executorEnv covers cluster
    # deployments.  setdefault so an operator-set value wins.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # guide §3.1/§9: let the planner pick shuffled-hash over sort-merge
        # when its size conditions are met — the verify/attach joins carry
        # wide signature arrays where skipping both sort passes is a
        # measured win (noop-isolated: 0.58 -> 0.42 s at sf0.1); AQE's size
        # checks still guard the build side at scale
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", os.environ["OPENBLAS_NUM_THREADS"])
        .config("spark.executorEnv.OMP_NUM_THREADS", os.environ["OMP_NUM_THREADS"])
        .config("spark.executorEnv.MKL_NUM_THREADS", os.environ["MKL_NUM_THREADS"])
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # TZ-less parquet timestamps always infer the same type: a flipped
        # NTZ inference changes what unix_micros/casts mean mid-pipeline
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_min_scan_parallelism(df, min_partitions: int | None = None):
    """Small-input guard: the local test fixtures are single-file,
    single-row-group parquet, so the scan — and every map-side Arrow kernel
    Catalyst fuses onto it (signatures, extraction, simhash) — runs on 1-2
    cores no matter how many the session has.  At cluster scale inputs carry
    orders of magnitude more row groups than cores and this returns the
    input unchanged; below the threshold it costs one round-robin shuffle of
    the raw rows (tiny by construction: only small inputs ever take it) and
    buys full-width kernel stages.

    Row order is not part of any operator's contract (all downstream
    consumers aggregate/join), so the round-robin redistribution is safe.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
