"""HLL distinct sketch: accuracy, partitioning invariance, merge identity."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.sketch import (
    corrected_estimate,
    hll_distinct,
    hll_merge_registers,
    hll_registers,
    hll_report,
)


def _items(spark, grp, n, offset=0, parts=4):
    # n distinct strings per group, each duplicated 3x (HLL must be
    # duplication-insensitive)
    return (
        spark.range(3 * n)
        .repartition(parts)
        .select(
            F.lit(grp).alias("g"),
            F.concat(F.lit(f"{grp}-item-"), ((F.col("id") % n) + offset).cast("string")).alias(
                "k"
            ),
        )
    )


def test_frozen_alpha_constants_match_formula():
    # the table is frozen (cross-engine determinism) but must equal the
    # stated formula — a transposed digit (718327 vs 718273, ADVICE r4)
    # silently biases every p=8 estimate
    from vid_dup_finder_lib_spark.operators.sketch import _ALPHA_E6

    for p, alpha in _ALPHA_E6.items():
        m = 1 << p
        assert alpha == round(0.7213 / (1 + 1.079 / m) * 1e6), p


def test_estimate_accuracy_and_zero_buckets(spark):
    # raw-estimator regime (n >> 5m/2 = 10240): sigma = 1.04/sqrt(4096)
    # ~ 1.6%; assert within 5% (3 sigma).  Small-n goes through the
    # client-side LinearCounting correction (the raw estimator is
    # DOCUMENTED as biased there — it degenerates to ~alpha*m as n -> 0).
    df = _items(spark, "a", 100_000).unionByName(_items(spark, "b", 500))
    rows = {r["g"]: r for r in hll_distinct(df, ["g"], F.col("k")).collect()}
    assert rows["a"]["m_buckets"] == 4096
    assert abs(rows["a"]["estimate"] - 100_000) / 100_000 < 0.05
    b = rows["b"]
    corrected = corrected_estimate(b["m_buckets"], b["n_zero_buckets"], b["estimate"])
    assert abs(corrected - 500) / 500 < 0.10
    # 500 items cannot fill 4096 buckets
    assert b["n_zero_buckets"] > 3000
    # large-n correction is a no-op (estimate above the 5m/2 cutoff)
    a = rows["a"]
    assert corrected_estimate(a["m_buckets"], a["n_zero_buckets"], a["estimate"]) == a["estimate"]


def test_partitioning_invariance(spark):
    df = _items(spark, "a", 2_000)
    one = hll_distinct(df.repartition(1), ["g"], F.col("k")).collect()[0]
    many = hll_distinct(df.repartition(16), ["g"], F.col("k")).collect()[0]
    assert one.asDict() == many.asDict()


def test_merge_equals_sketch_of_union(spark):
    # overlapping halves: union has 60000 distinct, each side 40000
    a = _items(spark, "g", 40_000, offset=0)
    b = _items(spark, "g", 40_000, offset=20_000)
    ra = hll_registers(a, ["g"], F.col("k"))
    rb = hll_registers(b, ["g"], F.col("k"))
    merged = hll_report(hll_merge_registers(ra, rb, ["g"]), ["g"]).collect()[0]
    direct = hll_distinct(a.unionByName(b), ["g"], F.col("k")).collect()[0]
    assert merged.asDict() == direct.asDict()
    assert abs(merged["estimate"] - 60_000) / 60_000 < 0.06


def test_null_keys_skipped_and_bad_p_raises(spark):
    df = spark.createDataFrame(
        [("g", "x"), ("g", None), ("g", "y")], "g string, k string"
    )
    row = hll_distinct(df, ["g"], F.col("k")).collect()[0]
    assert row["n_zero_buckets"] == 4096 - 2  # only x and y hit registers
    with pytest.raises(ValueError, match="p must be one of"):
        hll_registers(df, ["g"], F.col("k"), p=13)


def test_register_table_is_bounded(spark):
    # 50k items in ONE group -> at most m register rows
    df = _items(spark, "a", 50_000, parts=8)
    regs = hll_registers(df, ["g"], F.col("k"))
    assert regs.count() <= 4096
