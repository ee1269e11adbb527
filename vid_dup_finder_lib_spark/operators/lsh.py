"""LSH band candidate generation.

The reference prunes its O(n^2) Hamming sweep with a duration band
(``search_algorithm.rs:55-61,93-116``) and explicitly documents rejecting
BK-trees (``lib.rs:120-127``).  At 10^12 docs neither survives; the Spark-
native replacement is a MinHash **band self-join**: signatures are split into
``b`` bands of ``r`` rows, each band hashed to one bucket key, and candidates
are pairs sharing any bucket — an equi-join Catalyst can plan (shuffled hash /
sort-merge with AQE skew splitting).

Skew: boilerplate-heavy corpora collapse into mega-buckets.  Buckets larger
than ``cfg.max_bucket_size`` are **quarantined and reported** (returned as a
separate DataFrame), never silently dropped — SURVEY.md §7 hard-part 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig


def band_keys(signatures: DataFrame, cfg: SigConfig) -> DataFrame:
    """signatures -> (id, doclen, band_id, band_hash), one row per band.

    band_hash is xxhash64 over the band's minhash slice (JVM-side), so the
    exploded table stays narrow: 8-byte key instead of an r-element array.
    """
    r = cfg.rows_per_band
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda band: F.struct(
            band.alias("band_id"),
            F.xxhash64(
                band, F.concat_ws(",", F.transform(F.slice("minhash", band * r + 1, r), lambda v: v.cast("string")))
            ).alias("band_hash"),
        ),
    )
    return (
        signatures.where(F.col("error").isNull())
        .select("id", "doclen", F.explode(bands).alias("b"))
        .select("id", "doclen", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    )


def candidate_pairs(
    signatures: DataFrame, cfg: SigConfig
) -> tuple[DataFrame, DataFrame]:
    """All-pairs candidates from band buckets.

    Returns ``(pairs, quarantined_buckets)`` where pairs has columns
    ``(id1, id2)`` with ``id1 < id2``, distinct across bands, and
    quarantined_buckets reports ``(band_id, band_hash, bucket_size)`` for
    buckets exceeding the skew cap (excluded from pairs, counted, surfaced).
    """
    keys = band_keys(signatures, cfg)

    sizes = keys.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_size"))
    quarantined = sizes.where(F.col("bucket_size") > cfg.max_bucket_size)
    ok_keys = keys.join(
        F.broadcast(quarantined.select("band_id", "band_hash")),
        ["band_id", "band_hash"],
        "left_anti",
    )

    a = ok_keys.select(
        F.col("band_id"), F.col("band_hash"), F.col("id").alias("id1")
    )
    b = ok_keys.select(
        F.col("band_id"), F.col("band_hash"), F.col("id").alias("id2")
    )
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    return pairs, quarantined
