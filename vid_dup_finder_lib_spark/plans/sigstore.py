"""Hash-partitioned signature store: O(delta) persistence for incremental
refresh.

Round-2's one genuine scale gap: ``refresh_signatures`` COMPUTES only the
delta (the Arrow kernel touches changed rows only) but the checkpoint layer
PERSISTED by rewriting the whole signatures table — at 10^12 rows a daily
0.1 % delta would rewrite 100 TB of signature state per run.  The reference
touches only mutated cache entries (batched upserts,
``base_fs_cache.rs:254-270``; mtime diff ``processing_fs_cache.rs:149-199``).

This store is the Spark analog of an Iceberg ``MERGE INTO`` (the Iceberg
runtime jar is not in this container; the class isolates that choice):

* the table is partitioned on ``bucket = pmod(xxhash64(id), num_buckets)``
  — a stable hash of the primary key, so a row's partition never moves;
* an upsert computes the DIRTY bucket set from the delta (recomputed ∪
  deleted ids — typically a small fraction of buckets at daily-delta rates,
  and never more than num_buckets), reads ONLY those partitions back
  (partition pruning on the bucket filter), merges, and rewrites ONLY those
  bucket directories;
* each bucket swap is temp-write + rename (the same atomicity discipline as
  the checkpoint store), the outgoing generation of every rewritten bucket
  is retained under ``prev/`` until the next upsert, and the manifest
  (fingerprint guard + per-bucket row lineage) is written last.

Write path cost per refresh: O(|delta| + |dirty buckets| · bucket size) —
O(corpus) only when the delta touches every bucket, which at 10^12 rows and
sized ``num_buckets`` means the store rewrites exactly what changed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig

_MANIFEST = "_manifest.json"


def bucket_col(id_col: str, num_buckets: int):
    """Stable bucket assignment — MUST be the same expression on every code
    path (full write, upsert, dirty-set computation) or rows migrate."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int")


class PartitionedSignatureStore:
    """Bucketed parquet table with delta-only upsert.

    Schema-agnostic beyond requiring an ``id`` primary-key column; the
    pipeline stores the signature table here.  ``num_buckets`` sizes the
    rewrite granularity: dirty-partition rewrite cost is
    ``corpus_rows / num_buckets`` per dirty bucket, so at cluster scale
    pick ``num_buckets ≈ corpus_size / target_partition_size`` (10^4-10^5
    for 10^12 rows); the default suits the sandbox scale.
    """

    def __init__(
        self,
        root: str,
        cfg: SigConfig,
        num_buckets: int = 64,
        extra_fingerprint: dict | None = None,
    ):
        self.root = root
        self.cfg = cfg
        self.num_buckets = num_buckets
        self.extra_fingerprint = dict(extra_fingerprint or {})
        os.makedirs(root, exist_ok=True)

    # -- identity ----------------------------------------------------------

    def fingerprint(self) -> str:
        import hashlib

        payload = self.cfg.fingerprint() + json.dumps(
            {"num_buckets": self.num_buckets, **self.extra_fingerprint},
            sort_keys=True,
            default=str,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def exists(self) -> bool:
        m = self.manifest()
        if m is None:
            return False
        if m.get("fingerprint") != self.fingerprint():
            raise ValueError(
                f"signature store at {self.root} was written under fingerprint "
                f"{m.get('fingerprint')} but the current configuration is "
                f"{self.fingerprint()}; clear it or use a matching config"
            )
        return True

    # -- read --------------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        """Full table scan (bucket column dropped — it is storage-internal)."""
        return spark.read.parquet(self._data_dir()).drop("bucket")

    def _read_buckets(self, spark: SparkSession, buckets: list[int]) -> DataFrame:
        """Scan restricted to the given buckets; the IN filter on the
        partition column prunes every other directory at planning time."""
        return spark.read.parquet(self._data_dir()).where(
            F.col("bucket").isin([int(b) for b in buckets])
        )

    def read_previous(self, spark: SparkSession) -> DataFrame:
        """Time travel: the table as of BEFORE the last upsert — clean
        buckets from the current generation, dirty buckets from the
        retained ``prev/`` generation (match_db.rs timestamped-backup
        analog, one generation deep).  Raises if there is no retained
        generation (fresh store or full write)."""
        m = self.manifest()
        prev_root = os.path.join(self.root, "prev")
        if m is None or m.get("last_op") != "upsert" or not os.path.exists(prev_root):
            raise ValueError(
                f"signature store at {self.root} has no retained previous "
                "generation (no upsert has run since the last full write)"
            )
        dirty = [int(b) for b in m["last_dirty_buckets"]]
        clean = spark.read.parquet(self._data_dir()).where(
            ~F.col("bucket").isin(dirty)
        ).drop("bucket")
        prev_dirs = [
            os.path.join(prev_root, d)
            for d in os.listdir(prev_root)
            if d.startswith("bucket=")
        ]
        if not prev_dirs:
            return clean
        prev = spark.read.parquet(*prev_dirs)
        if "bucket" in prev.columns:  # partition col not inferred from leaf dirs
            prev = prev.drop("bucket")
        return clean.unionByName(prev)

    def restore_previous(self, spark: SparkSession) -> dict:
        """Roll back the last upsert in place: every dirty bucket's current
        dir is replaced by its retained ``prev/`` generation; a dirty
        bucket recorded in the manifest as CREATED by the upsert is
        removed.  One generation deep, like read_previous; the manifest
        records the restore.

        Crash-safe and idempotent: live data is only ever RENAMED into a
        trash dir (never rmtree'd in place), and each bucket's step is
        decided from the manifest's created-set plus the on-disk state —
        a retry after a mid-restore crash skips buckets whose prev/ dir
        was already swapped in (prev gone + cur present) instead of
        deleting the restored copy.  Trash is deleted only after the
        manifest commit."""
        m = self.manifest()
        prev_root = os.path.join(self.root, "prev")
        if m is None or m.get("last_op") != "upsert" or not os.path.exists(prev_root):
            raise ValueError(
                f"signature store at {self.root} has no retained previous "
                "generation to restore"
            )
        t0 = time.time()
        dirty = [int(b) for b in m["last_dirty_buckets"]]
        created = {int(b) for b in m.get("last_created_buckets", [])}
        data = self._data_dir()
        trash = os.path.join(self.root, f".restore-trash-{uuid.uuid4().hex[:8]}")
        os.makedirs(trash, exist_ok=True)
        for b in dirty:
            cur = os.path.join(data, f"bucket={b}")
            old = os.path.join(prev_root, f"bucket={b}")
            if b in created:
                # upsert created it; restore = remove (rename, not delete)
                if os.path.exists(cur):
                    os.rename(cur, os.path.join(trash, f"bucket={b}"))
            elif os.path.exists(old):
                if os.path.exists(cur):
                    os.rename(cur, os.path.join(trash, f"bucket={b}"))
                os.rename(old, cur)
            elif not os.path.exists(cur):
                raise RuntimeError(
                    f"restore_previous: bucket={b} missing from BOTH current "
                    f"and prev generations at {self.root} — store corrupted"
                )
            # else: prev gone + cur present -> this bucket was already
            # restored by an interrupted earlier attempt; nothing to do
        self._write_manifest(spark, "restore", dirty, t0)
        shutil.rmtree(prev_root, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        return {"restored_buckets": dirty}

    # -- write -------------------------------------------------------------

    def _write_manifest(
        self,
        spark: SparkSession,
        op: str,
        dirty: list[int],
        t0: float,
        extra: dict | None = None,
    ) -> None:
        per_bucket = {
            int(r["bucket"]): int(r["cnt"])
            for r in spark.read.parquet(self._data_dir())
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        manifest = {
            "stage": "signatures",
            "fingerprint": self.fingerprint(),
            "options": self.extra_fingerprint,
            "num_buckets": self.num_buckets,
            "last_op": op,
            "last_dirty_buckets": sorted(int(b) for b in dirty),
            "row_count": sum(per_bucket.values()),
            "partition_rows": per_bucket,
            "num_partitions": len(per_bucket),
            "upstream": ["docs"],
            "wall_seconds": round(time.time() - t0, 3),
            "schema": spark.read.parquet(self._data_dir()).schema.simpleString(),
        }
        manifest.update(extra or {})
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    def write_full(self, df: DataFrame, id_col: str = "id") -> None:
        """Initial (or forced) full write: every bucket directory is laid
        down in one partitioned write, then swapped in atomically."""
        t0 = time.time()
        spark = df.sparkSession
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex[:8]}")
        (
            df.withColumn("bucket", bucket_col(id_col, self.num_buckets))
            # one file per bucket dir: the write repartitions on the bucket
            # so a full write does not produce num_input_partitions files
            # per bucket directory
            .repartition(self.num_buckets, "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        data = self._data_dir()
        if os.path.exists(data):
            shutil.rmtree(data)
        os.rename(tmp, data)
        self._write_manifest(spark, "full", list(range(self.num_buckets)), t0)

    def upsert(
        self,
        recomputed: DataFrame,
        deleted_ids: DataFrame | None = None,
        id_col: str = "id",
    ) -> dict:
        """MERGE INTO-analog: replace/insert ``recomputed`` rows, drop
        ``deleted_ids``, rewriting ONLY the bucket partitions their ids hash
        into.  Returns {"dirty_buckets": [...], "rewritten": n}.

        The delta ids are collected to the driver only as BUCKET numbers
        (distinct, ≤ num_buckets values) — never as ids.
        """
        spark = recomputed.sparkSession
        t0 = time.time()
        # the delta is consumed three times below (dirty-set collect, the
        # anti-join, the merged union); if it has an Arrow-UDF stage
        # upstream (it does: the signature kernel) each consumer would
        # re-execute it — materialize once, it is O(delta) by definition
        recomputed = recomputed.localCheckpoint(eager=True)
        delta_ids = recomputed.select(F.col(id_col).alias("id"))
        if deleted_ids is not None:
            delta_ids = delta_ids.unionByName(
                deleted_ids.select(F.col(deleted_ids.columns[0]).alias("id"))
            )
        delta_ids = delta_ids.distinct().localCheckpoint(eager=True)
        dirty = sorted(
            int(r["b"])
            for r in delta_ids.select(bucket_col("id", self.num_buckets).alias("b"))
            .distinct()
            .collect()
        )
        if not dirty:
            return {"dirty_buckets": [], "rewritten": 0}

        # merged content of the dirty buckets: surviving old rows + recomputed
        old = self._read_buckets(spark, dirty).drop("bucket")
        survivors = old.join(delta_ids, old[id_col] == delta_ids["id"], "left_anti")
        merged = survivors.unionByName(
            recomputed.select(*old.columns)
        ).withColumn("bucket", bucket_col(id_col, self.num_buckets))

        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex[:8]}")
        (
            merged.repartition(max(len(dirty), 1), "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(tmp)
        )

        # per-bucket atomic swap; outgoing generations retained under prev/
        prev_root = os.path.join(self.root, "prev")
        if os.path.exists(prev_root):
            shutil.rmtree(prev_root)
        os.makedirs(prev_root, exist_ok=True)
        data = self._data_dir()
        created = []  # dirty buckets that had NO prior dir (restore removes
        # them instead of looking for a prev/ generation — the distinction
        # is recorded in the manifest so a crashed restore can retry safely)
        for b in dirty:
            cur = os.path.join(data, f"bucket={b}")
            new = os.path.join(tmp, f"bucket={b}")
            if os.path.exists(cur):
                os.rename(cur, os.path.join(prev_root, f"bucket={b}"))
            else:
                created.append(int(b))
            if os.path.exists(new):
                os.rename(new, cur)
            # a dirty bucket with no new dir means every row in it was
            # deleted: the old dir is retired and nothing replaces it
        shutil.rmtree(tmp, ignore_errors=True)
        self._write_manifest(
            spark, "upsert", dirty, t0, extra={"last_created_buckets": created}
        )
        return {"dirty_buckets": dirty, "rewritten": len(dirty)}
