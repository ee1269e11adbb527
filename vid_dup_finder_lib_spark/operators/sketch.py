"""Deterministic HyperLogLog distinct-count sketch, pure Spark expressions.

The corpus-profiling sketch a 100 TB pipeline runs where an exact
``count(DISTINCT shingle)`` cannot: estimating per-stratum distinct-item
cardinalities (distinct shingles per language, distinct urls per dump)
with a few KB of state per group instead of a shuffle of every distinct
item.  Flajolet et al.'s HLL, restated for this repo's contracts:

* **Cross-engine reproducible** — the item hash is the md5-prefix trick
  (same rationale as functions/featurize.py: Spark's ``xxhash64`` byte
  layout is engine-internal, md5 is universal): bucket = first ``p/4`` hex
  digits, the rank word ``w`` = the next 12 hex digits (48 bits), rho =
  49 − bit_length(w) (49 when w = 0).  Everything downstream is integer
  arithmetic, so Spark and the DuckDB oracle hash-match bit-for-bit.

* **No floats** — the harmonic mean 1/Σ 2^−M_j is kept exact by scaling
  with 2^49 (the max rank): Σ over seen registers of 2^(49−r) plus
  2^49 per never-hit register, in decimal(38,0).  The bias constant
  alpha_m enters as a frozen integer ppm (``_ALPHA_E6``), so the estimate
  is ``floor(alpha_e6 · m² · 2^49 / (denom · 10^6))`` — deterministic on
  any engine, any partitioning.  The small-range linear-counting
  correction needs a logarithm, so it is NOT applied; ``n_zero_buckets``
  is emitted so a caller can apply it client-side (documented contract).

* **Mergeable** — registers are a max-semilattice: the sketch of a union
  is the bucket-wise max of the sketches (``hll_merge_registers``), which
  is what lets per-shard / per-day sketches roll up without re-reading
  the data.  Test-pinned: merge == sketch-of-union, any partitioning.

Scale shape: one map-side-combinable groupBy(group, bucket) max — the
register table is at most ``m`` rows per group regardless of input size —
then one tiny groupBy(group).  No window, no collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: frozen alpha_m bias constants (ppm), m = 2^p: round(0.7213/(1+1.079/m)*1e6)
_ALPHA_E6 = {8: 718273, 12: 721110, 16: 721288}

_MAX_RANK = 49  # rank word is 48 bits; rho in [1, 49]


def _check_p(p: int) -> None:
    if p not in _ALPHA_E6:
        raise ValueError(
            f"p must be one of {sorted(_ALPHA_E6)} (hex-digit-aligned bucket "
            f"widths with frozen alpha constants), got {p}"
        )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    p: int = 12,
) -> DataFrame:
    """(group..., bucket, r): the HLL register table — bucket-wise max rank
    of the hashed ``key`` items per group.  At most ``2^p`` rows per group
    whatever the input size.  Null keys are skipped (a null item is no
    item, matching count(DISTINCT) semantics)."""
    _check_p(p)
    hexd = p // 4
    h = F.md5(key)
    w = F.conv(F.substring(h, hexd + 1, 12), 16, 10).cast("long")
    row = df.where(key.isNotNull()).select(
        *[F.col(c) for c in group_cols],
        F.conv(F.substring(h, 1, hexd), 16, 10).cast("int").alias("bucket"),
        F.when(w == 0, F.lit(_MAX_RANK))
        .otherwise(F.lit(_MAX_RANK) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho"),
    )
    return row.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("r"))


def hll_merge_registers(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sketch of a union = bucket-wise max of the sketches (the HLL merge
    identity; exact, not approximate — both sides see the same hash)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_report(
    registers: DataFrame,
    group_cols: list[str],
    p: int = 12,
) -> DataFrame:
    """Fold a register table into the per-group report:
    ``(group..., m_buckets, n_zero_buckets, registers_md5, estimate)``.

    ``estimate`` is the raw HLL estimator (no small-range correction — see
    module notes; apply linear counting client-side from n_zero_buckets
    when estimate < 5m/2 and n_zero_buckets > 0).  ``registers_md5``
    digests the full register state (bucket-ascending ``bucket:r`` list),
    so two runs — or two engines — can assert sketch equality without
    shipping the registers."""
    _check_p(p)
    m = 1 << p
    alpha_e6 = _ALPHA_E6[p]
    # python-API shiftleft takes only a literal count; the SQL form shifts
    # by an expression (rank is data-dependent)
    term = F.expr(f"shiftleft(cast(1 as bigint), {_MAX_RANK} - r)")
    per = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("seen"),
        F.sum(term.cast("decimal(38,0)")).alias("denom_seen"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("bucket", "r"))),
                    lambda s: F.concat_ws(":", s["bucket"].cast("string"), s["r"].cast("string")),
                ),
            )
        ).alias("registers_md5"),
    )
    zero_term = F.lit(1 << _MAX_RANK).cast("decimal(38,0)")
    denom = (
        F.col("denom_seen")
        + (F.lit(m).cast("decimal(38,0)") - F.col("seen")) * zero_term
    )
    # the numerator exceeds int64, so it enters as a string literal; `div`
    # (not `/` + floor) keeps the quotient integer-EXACT — decimal `/`
    # rounds at the result scale, and a near-integer quotient rounded up
    # would floor one off from the DuckDB oracle's true integer division
    num = F.lit(str(alpha_e6 * m * m * (1 << _MAX_RANK))).cast("decimal(38,0)")
    return per.select(
        *[F.col(c) for c in group_cols],
        F.lit(m).cast("long").alias("m_buckets"),
        (F.lit(m) - F.col("seen")).cast("long").alias("n_zero_buckets"),
        "registers_md5",
        num.alias("__num"),
        (denom * F.lit(1_000_000)).alias("__den"),
    ).selectExpr(
        *group_cols,
        "m_buckets",
        "n_zero_buckets",
        "registers_md5",
        "cast(__num div __den as long) as estimate",
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    p: int = 12,
) -> DataFrame:
    """registers -> report in one call (the common path)."""
    return hll_report(hll_registers(df, group_cols, key, p), group_cols, p)


def corrected_estimate(m_buckets: int, n_zero_buckets: int, estimate: int) -> int:
    """Client-side small-range correction (Flajolet's LinearCounting):
    below 5m/2 with empty buckets remaining, ``m · ln(m / V)`` beats the
    raw estimator (which degenerates to ~alpha·m as n -> 0).  Driver-side
    Python on the REPORT rows, never inside the oracle-gated plan — ln is
    a float, and the repo's cross-engine exactness rule stops at floats
    (module notes)."""
    import math

    if n_zero_buckets > 0 and estimate <= (5 * m_buckets) // 2:
        return int(round(m_buckets * math.log(m_buckets / n_zero_buckets)))
    return estimate
