"""Bloom-filter membership prefilter for incremental dedup against an
existing corpus.

The incremental-crawl question — "which of today's 10^9 incoming pages
already exist in the 10^12-page corpus?" — is an anti-/semi-join whose
corpus side is a thousand times the incoming batch.  Shuffling the corpus
per batch is the scale killer; the classical fix (public knowledge: Bloom
1970; Kirsch & Mitzenmacher 2006 double hashing; the same pattern Spark's
own runtime-filter injection uses JVM-side) is a compact Bloom filter built
ONCE over the corpus membership key, broadcast to the incoming scan, and a
map-side membership test that eliminates the non-duplicates (the vast
majority) before any join.  Only the bloom-positive sliver — true dups plus
the configured false-positive rate — reaches the exact verify join, so the
final output is EXACT: the filter can only cost extra verify rows, never
correctness.

Reference parity: the reference answers the same incremental question with
its on-disk blake3 hash cache (file_hash_filesystem_cache.rs) — a driver-
local exact set.  At cluster scale the exact set does not fit one machine;
the Bloom + exact-verify pair is the distributed analogue with the same
observable result.

Determinism contract (frozen): probe positions derive from SplitMix64
double hashing over the caller-supplied int64 key — ``h1 = sm64(x)``,
``h2 = sm64(x ^ GOLDEN) | 1``, ``pos_i = (h1 + i * h2) mod m_bits`` — so
the bitmap is bit-identical for ANY partitioning (set-bit OR is
commutative) and reimplementable without Spark.

Scale shape (100 TB):

* build — one corpus scan; each task accumulates a LOCAL bitmap across its
  Arrow batches and emits only its non-zero words as ``(word_idx, word)``
  rows, which a map-side-combinable ``bit_or`` aggregation ORs
  distributively into the REGISTER TABLE (:func:`bloom_words`) — which
  stays a DataFrame: nothing O(m_bits) ever lands on the driver;
* test, small filters (``m_bits`` ≤ ~2^27) — the register table collapses
  to a dense array (:func:`bloom_build`) shipped via a SparkContext
  broadcast (torrent-backed, once per executor, NOT per task) and the
  probe runs map-side in one vectorized Arrow pass: zero shuffle on the
  incoming side until the surviving sliver hits the exact join;
* test, corpus-scale filters — a useful filter over 10^12 keys is
  ~10^13 bits (≈ 1.2 TB): no driver array, no broadcast.
  :func:`bloom_candidates_join` probes the DISTRIBUTED register table:
  each incoming key explodes to its k ``(word_idx, bitmask)`` probes
  (same frozen Arrow kernel as the build, so positions are bit-identical
  by construction), equi-joins the register table on ``word_idx`` — both
  sides hash-partitioned on the same key, AQE handles residual skew —
  and a count-of-set-bits == k aggregation decides membership.  Two
  shuffles of O(incoming · k) rows instead of an impossible broadcast;
  the corpus-sized table shuffles ONCE per batch at most (checkpoint it
  bucketed by word_idx to amortize across batches).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _sm64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (same frozen contract as operators.ann)."""
    z = x + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing."""
    x = keys.view(np.uint64) if keys.dtype == np.int64 else keys.astype(np.uint64)
    h1 = _sm64(x)
    h2 = _sm64(x ^ _GOLDEN) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_m_bits(n_keys: int, fpr: float) -> int:
    """Textbook sizing: m = -n ln p / (ln 2)^2, rounded up to a word."""
    if not (0.0 < fpr < 1.0):
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = int(math.ceil(-n_keys * math.log(fpr) / (math.log(2) ** 2)))
    return max(64, (m + 63) // 64 * 64)


def bloom_optimal_k(m_bits: int, n_keys: int) -> int:
    return max(1, round(m_bits / max(1, n_keys) * math.log(2)))


def _check_bloom_args(corpus: DataFrame, key_col: str, m_bits: int, k: int) -> None:
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dt = dict(corpus.dtypes).get(key_col)
    if dt != "bigint":
        raise TypeError(
            f"bloom needs an int64 key column (got {key_col}: {dt}); "
            "derive one JVM-side, e.g. F.xxhash64(content_hash)"
        )


def bloom_words(
    corpus: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """The DISTRIBUTED Bloom register table: ``(word_idx, word)`` rows for
    every non-zero 64-bit word of the bitmap — the scale-safe form of the
    filter (nothing O(m_bits) exists anywhere; zero words are implicit).

    Each task folds its Arrow batches into a task-local dense bitmap and
    emits only the non-zero words; a map-side-combinable ``bit_or``
    aggregation ORs the partials.  Bit-identical for any partitioning
    (set-bit OR is commutative).  ``key_col`` must be int64 (hash the
    membership key with ``F.xxhash64`` first — it stays JVM-side); null
    keys raise rather than silently vanish from the filter (a null that
    later compared equal would be a silent false negative, the one error
    class a Bloom filter must never have).
    """
    _check_bloom_args(corpus, key_col, m_bits, k)
    n_words = m_bits // 64
    # a dense task-local accumulator is the fast path, but it is O(m_bits)
    # PER TASK — at corpus-scale m_bits the task would OOM exactly like the
    # driver would.  Above ~128 MiB per task, accumulate (word_idx, mask)
    # pairs and fold them sparsely (sort + reduceat OR): O(partition rows
    # · k) memory, independent of m_bits.
    dense_task = n_words <= (1 << 24)
    schema = StructType(
        [StructField("word_idx", LongType()), StructField("word", LongType())]
    )

    def _batch_positions(b: pd.DataFrame) -> np.ndarray | None:
        col = b[key_col]
        if col.isna().any():
            raise ValueError(
                "bloom_words: null membership key — a null in the filter "
                "would be a silent false negative; filter or impute first"
            )
        keys = col.to_numpy(np.int64)
        if len(keys) == 0:
            return None
        return _probe_positions(keys, m_bits, k).ravel()

    def build_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if dense_task:
            words = np.zeros(n_words, dtype=np.uint64)
            touched = False
            for b in batches:
                pos = _batch_positions(b)
                if pos is None:
                    continue
                touched = True
                np.bitwise_or.at(
                    words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
                )
            if touched:
                nz = np.flatnonzero(words)
                yield pd.DataFrame(
                    {
                        "word_idx": nz.astype(np.int64),
                        "word": words[nz].view(np.int64),
                    }
                )
            return
        chunks = [p for b in batches if (p := _batch_positions(b)) is not None]
        if not chunks:
            return
        pos = np.concatenate(chunks)
        widx = pos // 64
        mask = np.uint64(1) << (pos % 64).astype(np.uint64)
        order = np.argsort(widx, kind="stable")
        widx, mask = widx[order], mask[order]
        starts = np.flatnonzero(np.r_[True, widx[1:] != widx[:-1]])
        yield pd.DataFrame(
            {
                "word_idx": widx[starts].astype(np.int64),
                "word": np.bitwise_or.reduceat(mask, starts).view(np.int64),
            }
        )

    partial = corpus.select(key_col).mapInPandas(build_partition, schema)
    return partial.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_build(
    corpus: DataFrame, key_col: str, m_bits: int, k: int
) -> np.ndarray:
    """Collapse :func:`bloom_words` to the dense uint64 array — the
    broadcastable form for filters that FIT on the driver (~2^27 bits /
    16 MiB and below).  Beyond that, stay on the register table and
    :func:`bloom_candidates_join`; this function refuses at 2^31 bits
    (256 MiB dense) because a driver-resident multi-GiB bitmap is exactly
    the scale failure the distributed path exists to avoid.
    """
    if m_bits > (1 << 31):
        raise ValueError(
            f"bloom_build materializes m_bits/8 = {m_bits // 8} bytes on the "
            "driver; beyond 2^31 bits use bloom_words + bloom_candidates_join "
            "(the distributed register-table path)"
        )
    n_words = m_bits // 64
    rows = bloom_words(corpus, key_col, m_bits, k).collect()
    dense = np.zeros(n_words, dtype=np.int64)
    for r in rows:
        dense[r["word_idx"]] = r["word"]
    return dense.view(np.uint64)


def bloom_candidates(
    incoming: DataFrame,
    key_col: str,
    words: np.ndarray,
    m_bits: int,
    k: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Map-side membership probe: adds boolean ``out_col``.

    False positives possible (bounded by the filter's fpr), false negatives
    impossible for any key that went through :func:`bloom_build` — callers
    MUST still verify positives exactly (see :func:`incremental_exact_dedup`).
    """
    if words.dtype != np.uint64 or len(words) != m_bits // 64:
        raise ValueError("words must be the uint64 array from bloom_build")
    spark = incoming.sparkSession
    bcast = spark.sparkContext.broadcast(words)

    @F.pandas_udf(BooleanType())
    def probe(keys: pd.Series) -> pd.Series:
        w = bcast.value
        kk = keys.to_numpy(np.int64)
        pos = _probe_positions(kk, m_bits, k)
        bits = (w[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    return incoming.withColumn(out_col, probe(F.col(key_col)))


def bloom_candidates_join(
    incoming: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int,
    k: int,
    id_col: str,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe against the DISTRIBUTED register table — the path
    for filters too large to broadcast (a 10^12-key corpus needs ~1.2 TB
    of bitmap; no driver array, no broadcast can exist).

    Plan: each incoming key expands to its k probe positions via the SAME
    frozen Arrow kernel the build uses (bit-identical positions by
    construction — no reimplementation to drift), positions explode to
    ``(word_idx, bitmask)`` rows, a left equi-join on ``word_idx`` pulls
    the register words (both sides hash-partition on word_idx; a missing
    row is an all-zero word), and a per-row ``sum(bit set) == k``
    aggregation decides membership.  Cost: two shuffles of
    O(incoming · k) rows — independent of m_bits and of corpus size.

    ``id_col`` must uniquely key incoming rows (the aggregation restores
    row identity through the explode).  Returns ``incoming`` + boolean
    ``out_col``; same no-false-negative contract as
    :func:`bloom_candidates`.
    """
    _check_bloom_args(incoming, key_col, m_bits, k)

    @F.pandas_udf("array<long>")
    def probe_pos(keys: pd.Series) -> pd.Series:
        if keys.isna().any():
            raise ValueError("bloom_candidates_join: null membership key")
        pos = _probe_positions(keys.to_numpy(np.int64), m_bits, k)
        return pd.Series(list(pos))

    probes = incoming.select(
        F.col(id_col).alias("__bid"), F.explode(probe_pos(F.col(key_col))).alias("__p")
    ).select(
        "__bid",
        F.expr("__p div 64").alias("word_idx"),
        # shiftleft's bit count must be a column here; the python helper
        # only takes an int literal
        F.expr("shiftleft(1L, cast(__p % 64 as int))").alias("__mask"),
    )
    hits = (
        probes.join(words, "word_idx", "left")
        .select(
            "__bid",
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("__mask")) == F.col("__mask"))
            )
            .cast("int")
            .alias("__set"),
        )
        .groupBy("__bid")
        .agg((F.sum("__set") == F.lit(k)).alias(out_col))
    )
    return incoming.join(
        hits.withColumnRenamed("__bid", id_col), id_col, "inner"
    )


def incremental_exact_dedup(
    incoming: DataFrame,
    corpus: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int | None = None,
    k: int | None = None,
    fpr: float = 0.01,
    mode: str = "auto",
) -> DataFrame:
    """EXACT incremental membership with the Bloom prefilter on the fast
    path: ``(id, is_dup)`` for every incoming row, where ``is_dup`` means
    the row's content sha256 exists in ``corpus``.

    Only bloom-positive incoming rows join the corpus (left-semi on the
    content hash); bloom-negatives are exact non-members by the no-false-
    negative guarantee and bypass the join entirely.  The output is
    therefore identical to a plain semi-join — the filter is pure plan
    optimization, which is what makes the operator oracle-checkable.

    Null-content semantics: a null ``content_col`` hashes to a null sha256,
    which equals nothing in the exact semi-join — null-text rows are
    therefore never duplicates (of each other or of anything), the same
    rule the batch exact-dedup path and the streaming state keys use.

    ``mode`` picks the probe plan — the OUTPUT is identical either way:
    ``"broadcast"`` collapses the filter to a dense driver array and
    probes map-side (right for filters under ~2^27 bits); ``"join"``
    keeps the register table distributed and probes via the word_idx
    equi-join (the only option at corpus scale, where a useful filter is
    tens of GB); ``"auto"`` switches on the sized m_bits.  ``id_col``
    must uniquely key incoming rows (both the join probe and the final
    output join restore row identity through it).
    """
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto|broadcast|join, got {mode!r}")
    h = F.sha2(F.col(content_col).cast("binary"), 256)
    key = F.xxhash64(h)
    corp = corpus.select(key.alias("__mkey"), h.alias("__mhash"))
    inc = incoming.select(
        F.col(id_col), key.alias("__mkey"), h.alias("__mhash")
    )
    if m_bits is None or k is None:
        # sizing scan — skipped entirely when the caller passes m_bits AND k
        # (at corpus scale the row count is already in table metadata)
        n_corpus = max(1, corp.count())
    mb = m_bits if m_bits is not None else bloom_m_bits(n_corpus, fpr)
    kk = k if k is not None else bloom_optimal_k(mb, n_corpus)
    use_join = mode == "join" or (mode == "auto" and mb > (1 << 27))
    if use_join:
        flagged = bloom_candidates_join(
            inc, "__mkey", bloom_words(corp, "__mkey", mb, kk), mb, kk, id_col
        )
    else:
        flagged = bloom_candidates(
            inc, "__mkey", bloom_build(corp, "__mkey", mb, kk), mb, kk
        )
    # flagged feeds both the positive-sliver join and the final output
    # join: materialize, or the Arrow probe (and the incoming scan) run
    # once per consumer (the repo's multi-consumer rule)
    flagged = flagged.localCheckpoint(eager=True)
    # exact verify ONLY on the bloom-positive sliver; sha256 (not the
    # 64-bit xxhash join key) is the equality the semi-join tests, so a
    # 64-bit key collision cannot fabricate a duplicate
    dups = (
        flagged.where(F.col("bloom_hit"))
        .join(corp.select("__mhash"), "__mhash", "left_semi")
        .select(id_col)
    )
    return (
        flagged.select(id_col)
        .join(dups.withColumn("__is_dup", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col), F.coalesce("__is_dup", F.lit(False)).alias("is_dup")
        )
    )
