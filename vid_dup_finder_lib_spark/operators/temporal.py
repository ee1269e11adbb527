"""Temporal operators over event streams: as-of join, gap sessionization,
tumbling-window rollup.

A web-scale training-data pipeline is not only dedup: crawl/event telemetry
feeds it (which page version was live when a label was captured, how user
interaction sessions delimit documents, per-window ingest rates).  Spark has
no built-in as-of join (the task brief names it as a required custom
operator); the reference's closest analog is the mtime-based "which cache
entry was current at scan time" logic (``processing_fs_cache.rs:149-199``).

Scale notes:

* ``asof_join`` uses the union + ordered carry-forward formulation: tag both
  sides, union, one window per key ordered by (ts, side).  ONE shuffle on
  the key — no range-condition join, which Catalyst would plan as a
  broadcast-nested-loop (quadratic per key).  A pathologically hot key
  serializes its own carry-forward scan (windows are per-key sequential);
  that is inherent to ordered semantics and documented, not hidden — at
  10^12 rows you pre-partition by (key, coarse time bucket) if a single
  entity can dominate.
* ``sessionize`` is lag + running sum over the same per-key window shape.
* ``window_rollup`` is a pure groupBy on a truncated timestamp — map-side
  combinable, no window function, the cheapest possible shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_us(col) -> Column:
    """Microseconds since epoch for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ
    is interpreted in the session timezone — UTC throughout this repo —
    matching DuckDB's ``epoch_us`` on naive timestamps)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: each left row picks the right row with
    the greatest ``right_ts <= left_ts`` for the same ``on`` key (DuckDB
    ``ASOF JOIN`` semantics, pandas ``merge_asof(direction='backward')``).

    Left rows with no prior right row keep null right columns (left outer).
    ``tolerance_us`` additionally requires ``left_ts - right_ts`` within the
    given microseconds (matches met right rows only).

    Right-side columns come back prefixed ``r_``.  If several right rows
    share the matching (key, ts) the one latest in (ts, natural column
    order) wins — pre-dedupe the right side for full determinism, as
    q_asof_view_before_click does.

    Null timestamps: right rows with a null ``right_ts`` can never satisfy
    ``right_ts <= left_ts`` and are dropped before the join (Spark's
    ascending sort is NULLS FIRST, so without the filter a null-ts right
    row would sort to the partition head and be carried into every match —
    diverging from the ASOF/merge_asof semantics above).  Left rows with a
    null ``left_ts`` also sort to the head, ahead of every right row, and
    therefore keep null match columns.
    """
    rcols = [c for c in right.columns if c != on]
    right = right.where(F.col(right_ts).isNotNull())
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"),
    )
    # right rows sort before left rows at equal ts -> "<=" is inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
    )
    if tolerance_us is not None:
        carried = carried.withColumn(
            "_match",
            F.when(
                F.col(f"_match.{right_ts}").isNotNull()
                & (
                    epoch_us(F.col("_ts")) - epoch_us(F.col(f"_match.{right_ts}"))
                    <= F.lit(tolerance_us)
                ),
                F.col("_match"),
            ),
        )
    out = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"r_{c}") for c in rcols
    ]
    return carried.select(*out)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width_us: int = 3_600_000_000,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Interval join: left rows whose ``left_point`` timestamp falls inside
    a right row's ``[right_start, right_end]`` (both inclusive), per ``on``
    key — the range-join custom operator the task brief names.

    Catalyst plans a raw ``l.ts BETWEEN r.start AND r.end`` as a broadcast
    nested loop (or per-key quadratic sort-merge) — quadratic blow-up on
    hot keys.  This is the bucketized form: each right interval is exploded
    to the coarse time buckets it covers, each left point owns exactly ONE
    bucket, and the join is an equi-join on (key, bucket) + an exact
    residual filter.  Because a matching pair meets only in the point's own
    bucket, the output needs NO distinct — replication cost is
    ceil(interval/bucket_width) rows on the right side only.

    Pick ``bucket_width_us`` near the typical interval length: too small
    replicates long intervals widely; too big funnels everything into few
    buckets.  An interval that would explode into more than
    ``max_buckets_per_interval`` bucket rows RAISES (fail-fast valve — the
    repo rule is no silent blow-ups and no silent drops; fix the bucket
    width or the data).  An INVERTED interval (``right_end < right_start``,
    e.g. a zero/sentinel end under a real start) also RAISES: it can never
    match, but ``sequence(start, stop)`` with start > stop silently steps
    -1 and would explode one bad row into a huge DESCENDING bucket list
    that the residual filter then discards — pure hidden cost, the exact
    blow-up class the valve exists to stop.  Right columns come back
    prefixed ``r_``.
    """
    lp = epoch_us(F.col(left_point))
    rs, re = epoch_us(F.col(right_start)), epoch_us(F.col(right_end))
    w = F.lit(bucket_width_us)
    n_buckets = F.floor(re / w) - F.floor(rs / w) + 1
    # the guards are FOLDED INTO the sequence bound (add 0 or raise): a
    # standalone guard column would be dead code Catalyst prunes away.
    # Inverted intervals are checked FIRST — n_buckets <= 0 there, so the
    # cap comparison alone would never fire (round-3 advice item).
    guard_zero = F.coalesce(
        F.when(
            re < rs,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"range_join: inverted interval ({right_end} < {right_start}) "
                        "— filter or repair bad rows upstream (row key: "
                    ),
                    F.col(on).cast("string"),
                    F.lit(")"),
                )
            ).cast("long"),
        ).when(
            n_buckets > max_buckets_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"range_join: interval spans more than {max_buckets_per_interval} "
                        f"buckets at bucket_width_us={bucket_width_us} — raise the bucket "
                        "width or cap the interval (row key: "
                    ),
                    F.col(on).cast("string"),
                    F.lit(")"),
                )
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    lb = left.select(
        F.col(on).alias("_k"),
        F.floor(lp / w).alias("_b"),
        lp.alias("_lp"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    rb = right.select(
        F.col(on).alias("_k"),
        F.explode(F.sequence(F.floor(rs / w), F.floor(re / w) + guard_zero)).alias("_b"),
        rs.alias("_rs"),
        re.alias("_re"),
        F.struct(*[F.col(c) for c in right.columns if c != on]).alias("_r"),
    )
    joined = lb.join(rb, ["_k", "_b"]).where(
        (F.col("_lp") >= F.col("_rs")) & (F.col("_lp") <= F.col("_re"))
    )
    out = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_r.{c}").alias(f"r_{c}") for c in right.columns if c != on
    ]
    return joined.select(*out)


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_seconds`` (or at the first
    event).  Adds ``session_idx`` (0-based per key, in time order).

    Ties on ``ts`` are ordered by every remaining column for determinism.
    """
    others = [c for c in events.columns if c not in (key, ts)]
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in others]
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    new_flag = (
        F.coalesce(
            (epoch_us(F.col(ts)) - epoch_us(F.lag(ts).over(w)))
            > F.lit(gap_us),
            F.lit(True),
        )
    ).cast("long")
    return events.withColumn(
        "session_idx",
        F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1,
    )


def window_rollup(
    events: DataFrame,
    width: str = "hour",
    ts: str = "ts",
    group_cols: tuple[str, ...] = (),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup: (window_start, *group_cols) -> count + exact
    decimal sum + min/max of ``value_col``.

    The sum runs on DECIMAL(18,2): float addition is order-dependent under
    Spark's partial aggregation, so a double sum is not reproducible across
    partitionings — decimal is exact, associative, and oracle-comparable.
    Value contract: ``value_col`` must fit decimal(18,2)'s 16 integer
    digits — an overflowing row RAISES (Spark's non-ANSI cast would
    silently null it out of the sum while n_events still counted it, the
    exact silent-drop class the repo forbids); sub-cent precision is
    rounded half-up to 2 decimals by design (money-like domain).
    Pure groupBy (map-side combinable); window_start is emitted as epoch
    microseconds (timezone-free for cross-engine comparison).

    Fixed-width units (minute/hour/day) bucket by integer floor over epoch
    microseconds — session-timezone-independent, unlike ``date_trunc``,
    whose day boundary is defined in the session TZ and diverged under the
    round-3 driver harness.  Calendar widths (week/month/year) have no
    fixed microsecond width and still use ``date_trunc``; run those under
    an explicitly pinned session TZ.
    """
    fixed_us = {"minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000}
    if width in fixed_us:
        w_us = F.lit(fixed_us[width])
        start_us = (F.floor(epoch_us(F.col(ts)) / w_us) * w_us).cast("long")
    else:
        start_us = epoch_us(F.date_trunc(width, F.col(ts)))
    dec_raw = F.col(value_col).cast("decimal(18,2)")
    dec = F.when(
        F.col(value_col).isNotNull() & dec_raw.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"window_rollup: {value_col} overflows decimal(18,2): "),
                F.col(value_col).cast("string"),
            )
        ).cast("decimal(18,2)"),
    ).otherwise(dec_raw)
    return (
        events.groupBy(
            start_us.alias("window_start_us"),
            *[F.col(c) for c in group_cols],
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec).alias("value_sum"),
            F.min(F.col(value_col)).alias("value_min"),
            F.max(F.col(value_col)).alias("value_max"),
        )
    )
