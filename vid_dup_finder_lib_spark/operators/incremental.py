"""Incremental signature refresh.

The reference's cache recomputes only entries whose filesystem mtime drifted
more than 2 s from the cached mtime, and garbage-collects deleted files
(``processing_fs_cache.rs:78-199``, drift check ``:181-192``).  Text analog:
``warc_ts`` is the mtime; the signatures checkpoint table is the cache.

``plan_refresh`` computes the three disjoint work sets as DataFrames — no
driver-side diffing — and ``refresh_signatures`` executes: recompute only
changed+new rows (the expensive Arrow-UDF stage touches *only* those), keep
unchanged signatures as-is, drop deleted ids.  At 10^12 docs the daily delta
is orders of magnitude smaller than the corpus; this is the operator that
makes the pipeline affordable to re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.operators.signatures import build_signatures

# mtime drift tolerance: 2 s, as processing_fs_cache.rs:181-192
STALENESS_SECONDS = 2


def plan_refresh(
    docs: DataFrame,
    cached: DataFrame,
    id_col: str = "url",
    ts_col: str = "warc_ts",
    reload_errors: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (to_compute_docs, keep_signatures, deleted_ids).

    The plan is granularity-agnostic — it diffs only ids and timestamps —
    so it deliberately takes no ``unit``: the signature granularity enters
    at ``compute_signature_delta``/``refresh_signatures``, which run the
    kernel, and in the checkpoint fingerprint, which refuses a unit flip.

    ``cached`` must carry (id, cached_ts) alongside its signature columns.
    A row needs recompute when it is new or its timestamp drifted more than
    STALENESS_SECONDS in either direction (the reference compares absolute
    drift, not ordering).

    ``reload_errors``: additionally recompute every still-live row whose
    cached signature is an error value — the ``--reload-errs`` flag
    (video_hash_filesystem_cache.rs:160-166, app_fns.rs:816-824).  Transient
    extraction failures are common at corpus scale; without this flag they
    stay cached forever (the reference's default, kept here too).
    """
    live = docs.select(F.col(id_col).alias("id"), F.col(ts_col).alias("live_ts"))
    state = cached.select("id", F.col("cached_ts"))

    joined = live.join(state, "id", "left")
    stale_or_new = joined.where(
        F.col("cached_ts").isNull()
        | (
            F.abs(
                F.unix_timestamp("live_ts") - F.unix_timestamp("cached_ts")
            )
            > STALENESS_SECONDS
        )
    ).select("id")
    if reload_errors:
        err_live = (
            cached.where(F.col("error").isNotNull())
            .select("id")
            .join(live.select("id"), "id", "left_semi")
        )
        stale_or_new = stale_or_new.union(err_live).distinct()

    to_compute = docs.join(
        stale_or_new.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    keep = cached.join(live, "id", "left_semi").join(stale_or_new, "id", "left_anti")
    deleted = state.select("id").join(live.select("id"), "id", "left_anti")
    return to_compute, keep, deleted


SIG_COLS = [
    "id", "doclen", "token_hashes", "shingle_count", "shingle_hashes",
    "minhash", "simhash", "content_hash", "error", "cached_ts",
]


def _fresh_cols(df: DataFrame) -> DataFrame:
    return df.select(*SIG_COLS)


def compute_signature_delta(
    docs: DataFrame,
    cached: DataFrame,
    cfg: SigConfig,
    id_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    reload_errors: bool = False,
    unit: str = "token",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The refresh delta as three frames: (recomputed, kept, deleted_ids).

    ``recomputed`` runs the Arrow kernel over ONLY the changed/new docs;
    ``kept`` is the untouched cached rows; ``deleted_ids`` are ids gone from
    the live corpus.  This is the O(delta) unit the partitioned store
    persists (plans/sigstore.py) — recomputed ∪ deleted decide the dirty
    buckets, kept rows in clean buckets are never rewritten.
    """
    to_compute, keep, deleted = plan_refresh(
        docs, cached, id_col, ts_col, reload_errors=reload_errors
    )
    recomputed = build_signatures(to_compute, cfg, id_col, text_col, unit=unit).join(
        to_compute.select(F.col(id_col).alias("id"), F.col(ts_col).alias("cached_ts")),
        "id",
    )
    return _fresh_cols(recomputed), _fresh_cols(keep), deleted


def refresh_signatures(
    docs: DataFrame,
    cached: DataFrame | None,
    cfg: SigConfig,
    id_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    reload_errors: bool = False,
    unit: str = "token",
) -> DataFrame:
    """New signature table = recomputed(changed+new) ∪ kept(unchanged).

    ``unit`` is the signature granularity (token | char, see
    build_signatures); the CALLER owns consistency between runs — the
    pipeline puts it in the checkpoint fingerprint, so a unit flip against
    cached signatures refuses instead of silently mixing granularities.

    Output carries ``cached_ts`` so the next round can diff against it.
    Errors remain cached values and are NOT retried unless the doc row
    changed (the reference's cached-error default, generic_cache_if.rs:22-45)
    or ``reload_errors=True`` (the ``--reload-errs`` flag), which adds every
    still-live error row to the recompute set.
    """
    if cached is None:
        fresh = build_signatures(docs, cfg, id_col, text_col, unit=unit).join(
            docs.select(F.col(id_col).alias("id"), F.col(ts_col).alias("cached_ts")), "id"
        )
        return _fresh_cols(fresh)

    recomputed, keep, _deleted = compute_signature_delta(
        docs, cached, cfg, id_col, text_col, ts_col,
        reload_errors=reload_errors, unit=unit,
    )
    return recomputed.unionByName(keep)
