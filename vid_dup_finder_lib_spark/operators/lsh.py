"""LSH band candidate generation.

The reference prunes its O(n^2) Hamming sweep with a duration band
(``search_algorithm.rs:55-61,93-116``) and explicitly documents rejecting
BK-trees (``lib.rs:120-127``).  At 10^12 docs neither survives; the Spark-
native replacement is a MinHash **band self-join**: signatures are split into
``b`` bands of ``r`` rows, each band hashed to one bucket key, and candidates
are pairs sharing any bucket — an equi-join Catalyst can plan (shuffled hash /
sort-merge with AQE skew splitting).

Skew: boilerplate-heavy corpora collapse into mega-buckets.  Buckets larger
than ``cfg.max_bucket_size`` are salted; pathological ones are **quarantined
and reported** (returned as a separate DataFrame) or, with
``overcap="sample"``, served by a deterministic bounded sample — never
silently dropped (SURVEY.md §7 hard-part 3).  The at-the-source fix is
operators/boilerplate.py (strip the high-df lines that create the buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig


def band_keys(signatures: DataFrame, cfg: SigConfig) -> DataFrame:
    """signatures -> (id, doclen, band_id, band_hash), one row per band.

    band_hash is xxhash64 over the band's minhash slice (JVM-side), so the
    exploded table stays narrow: 8-byte key instead of an r-element array.
    xxhash64 hashes the sliced array column NATIVELY (HashExpression
    supports ArrayType) — no per-band string casts/concat; measured 1.8x
    faster than the concat_ws formulation at sf0.1 with identical bucket
    structure.  Band-hash values are run-internal (joins and bucket-size
    counts only; never persisted), so the encoding is free to change.
    """
    r = cfg.rows_per_band
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda band: F.struct(
            band.alias("band_id"),
            F.xxhash64(band, F.slice("minhash", band * r + 1, r)).alias("band_hash"),
        ),
    )
    return (
        signatures.where(F.col("error").isNull())
        .select("id", "doclen", F.explode(bands).alias("b"))
        .select("id", "doclen", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    )


def _salted_pairs(hot_keys: DataFrame, salt_groups: int) -> DataFrame:
    """All-pairs inside oversized buckets via triangle block-pairing.

    Each member draws a deterministic salt block b in [0, g); the pair
    (x, y) is generated exactly once, in the partition keyed by
    (bucket, min(bx,by), max(bx,by)).  Every such partition holds ~s/g
    members per side, so no single task ever materializes a full hot
    bucket — the "salted repartitioning" the north_rule demands, with the
    same output as the unsalted self-join.

    Replication factor is g per row (each member joins g block-pairs), so
    g is chosen as ~sqrt(bucket_size / max_bucket_size) by the caller.
    """
    g = salt_groups
    member = hot_keys.select(
        "band_id",
        "band_hash",
        "id",
        (F.pmod(F.xxhash64("id"), F.lit(g))).cast("int").alias("blk"),
    )
    # side A participates in block-pairs (blk, j) for j >= blk; side B in
    # (i, blk) for i <= blk — together exactly one copy of each block pair.
    a = member.select(
        "band_id", "band_hash", F.col("id").alias("id1"), F.col("blk").alias("b1"),
        F.explode(F.sequence(F.col("blk"), F.lit(g - 1))).alias("b2"),
    )
    b = member.select(
        F.col("band_id").alias("band_id_b"),
        F.col("band_hash").alias("band_hash_b"),
        F.col("id").alias("id2"),
        F.col("blk").alias("blk2"),
    )
    joined = a.join(
        b,
        (a["band_id"] == b["band_id_b"])
        & (a["band_hash"] == b["band_hash_b"])
        & (a["b2"] == b["blk2"]),
    ).where(
        # within the diagonal block (b1 == b2) order by id to halve;
        # across blocks the block-pair orientation already dedupes
        ((F.col("b1") == F.col("b2")) & (F.col("id1") < F.col("id2")))
        | (F.col("b1") < F.col("b2"))
    )
    return joined.select(
        F.least("id1", "id2").alias("id1"), F.greatest("id1", "id2").alias("id2")
    )


def candidate_pairs(
    signatures: DataFrame,
    cfg: SigConfig,
    salt_groups: int = 16,
    overcap: str = "quarantine",
) -> tuple[DataFrame, DataFrame]:
    """All-pairs candidates from band buckets, skew-managed in three tiers.

    * buckets <= max_bucket_size: plain bucket self-join (AQE skew-split
      handles moderate imbalance);
    * buckets in (max_bucket_size, max_bucket_size * salt_groups^2]:
      salted triangle block-pairing (_salted_pairs) — same pairs, bounded
      per-task memory;
    * larger still, ``overcap`` policy:
        - ``"quarantine"`` (default): no pairs, bucket *reported*;
        - ``"sample"``: a deterministic hash-threshold sample of
          ~max_bucket_size members per bucket (no per-bucket sort — a window
          rank would materialize the very bucket we're avoiding) feeds the
          salted pair path; the bucket is still reported, with
          ``policy='sampled'``.  Expected within-bucket pair coverage is
          (max_bucket_size/bucket_size)^2 per band — a *bounded, reported*
          recall trade for boilerplate-heavy corpora, instead of losing the
          bucket outright.  True dup pairs share many bands, so pair-level
          recall is 1-(1-c)^b_shared (c = coverage), much higher than c.

    ``cfg.min_band_collisions`` (default 1 = classic OR-of-bands) keeps
    only pairs colliding in >= c of the b bands.  Every tier emits exactly
    one row per (band, pair), so the multiplicity the final dedup sees IS
    the band-collision count — counting instead of distinct-ing is free
    (same shuffle).  Collisions per pair ~ Binomial(b, J^r); with the
    char-query geometry (b=64, r=2) a pair at exactly the verify threshold
    J=1/2 has p=1/4 per band and P(count < 3) ~ 2.5e-6 — recall stays ~1 —
    while J~0.1 background pairs (p=0.01, the char-gram noise floor of
    templated text, where EVERY unrelated doc pair shares hot 5-grams)
    drop from P(>=1)=0.47 to P(>=3)=0.026.  Measured on the char corpus at
    sf0.1: 11.4M candidates -> 0.34M (34x) with the verified edge set
    identical.  The win is NOT the candidate shuffle (already paid) but
    the verify join behind it, which ships two shingle-hash arrays per
    candidate.  Leave at 1 when E[count] = b*J^r at the verify threshold
    is not >> c (the binomial argument needs the margin).  Lives on
    SigConfig (fingerprinted) so stores and incremental folds never mix
    collision rules.

    Returns ``(pairs, quarantined_buckets)``; pairs are (id1 < id2), distinct
    across bands and tiers; quarantined_buckets carries
    (band_id, band_hash, bucket_size, policy) — never silently dropped.
    """
    if overcap not in ("quarantine", "sample"):
        raise ValueError(f"unknown overcap policy {overcap!r}")
    from pyspark.sql.window import Window

    min_band_collisions = cfg.min_band_collisions
    keys = band_keys(signatures, cfg)

    # bucket sizing rides the SAME shuffle the bucket self-join needs
    # (guide §2.4): a count window partitioned by (band_id, band_hash)
    # attaches each member's bucket size after ONE exchange, and every
    # tier becomes a filter on that column — no separate eager stats job,
    # no broadcast anti/semi-joins, no action inside this function at all
    # (the r5 shape ran a checkpointed count aggregation plus three
    # broadcast joins; measured ~1 s per chain query at sf0.1).  The
    # window's required clustering equals the join key, so Catalyst plans
    # one exchange for both and reuses it across the tier branches;
    # WindowExec buffers one bucket group at a time and SPILLS above the
    # window buffer threshold, so a mega bucket degrades to disk instead
    # of an OOM (unlike a collect_list aggregation, which was the rejected
    # fusion).  Tier semantics and the emitted (band, pair) multiset are
    # unchanged.
    hard_cap = cfg.max_bucket_size * salt_groups * salt_groups
    w = Window.partitionBy("band_id", "band_hash")
    sized = keys.withColumn("bs", F.count(F.lit(1)).over(w))

    ok_keys = sized.where(F.col("bs") <= cfg.max_bucket_size)
    a = ok_keys.select("band_id", "band_hash", F.col("id").alias("id1"))
    b = ok_keys.select("band_id", "band_hash", F.col("id").alias("id2"))
    plain = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )

    hot_keys = sized.where(
        (F.col("bs") > cfg.max_bucket_size) & (F.col("bs") <= hard_cap)
    ).select("band_id", "band_hash", "id")
    salted = _salted_pairs(hot_keys, salt_groups).select("id1", "id2")
    pairs = plain.unionByName(salted)

    if overcap == "sample":
        # deterministic hash-threshold sampling: keep a member with
        # probability max_bucket_size/bucket_size — a filter on the sized
        # rows (bs is already attached), so no task ever holds a full
        # over-cap bucket
        scale = 1_000_000
        sampled_keys = (
            sized.where(F.col("bs") > hard_cap)
            .where(
                F.pmod(
                    F.xxhash64("id", F.lit("overcap-sample"), "band_hash"),
                    F.lit(scale),
                )
                * F.col("bs")
                < F.lit(cfg.max_bucket_size * scale)
            )
            .select("band_id", "band_hash", "id")
        )
        degraded = _salted_pairs(sampled_keys, salt_groups).select("id1", "id2")
        pairs = pairs.unionByName(degraded)

    # one row per over-hard-cap bucket; all members carry the same bs, so
    # max() is exact (and the groupBy reuses the (band, hash) clustering)
    quarantined = (
        sized.where(F.col("bs") > hard_cap)
        .groupBy("band_id", "band_hash")
        .agg(F.max("bs").alias("bucket_size"))
        .withColumn(
            "policy", F.lit("sampled" if overcap == "sample" else "dropped")
        )
    )
    if min_band_collisions > 1:
        pairs = (
            pairs.groupBy("id1", "id2")
            .agg(F.count(F.lit(1)).alias("_collisions"))
            .where(F.col("_collisions") >= min_band_collisions)
            .select("id1", "id2")
        )
        return pairs, quarantined
    return pairs.distinct(), quarantined
