"""JVM-side text column functions.

These are the analog of the reference's per-frame preprocessing pipeline
(grayscale projection + resize, ``vid_dup_finder_common/src/video_frames_gray.rs:181-193``,
``resize_gray.rs:11-54``) — but expressed as built-in Catalyst expressions so
they run inside whole-stage codegen, never in Python.  Only the MinHash /
SimHash reductions (functions/hashing.py) leave the JVM, and those via Arrow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(text: Column) -> Column:
    """Whitespace-collapse + trim + lowercase.

    Analog of luma centering (dct_3d.rs:69-78): a cheap canonicalization
    applied before signature extraction.  The whitespace class is spelled out
    explicitly — ``[ \\t\\n\\r\\f\\x0B]+`` — because the three engines'
    ``\\s`` disagree on vertical tab (Java and Arrow/RE2 include \\x0B,
    DuckDB's RE2 ``\\s`` does not); the explicit class is identical in all
    three, matching the Arrow kernel (sigkernel._WS_PATTERN) and the DuckDB
    oracle bit-for-bit.
    """
    return F.lower(F.trim(F.regexp_replace(text, r"[ \t\n\r\f\x0B]+", " ")))


def tokens_col(norm_text: Column) -> Column:
    """Split normalized text on single spaces (empty text -> empty array)."""
    return F.when(F.length(norm_text) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm_text, " ")
    )


def token_count_col(norm_text: Column) -> Column:
    return F.size(tokens_col(norm_text)).cast("long")


def shingles_col(tokens: Column, k: int) -> Column:
    """Distinct k-token shingles, space-joined.

    Built from sequence+transform+slice so the whole thing stays in codegen.
    Docs with fewer than k tokens yield an empty array (the reference's
    NotEnoughFrames analog, video_hash_builder.rs:159-167 — such docs carry
    an error marker instead of a signature).
    """
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), n - k)  # 0 .. n-k inclusive
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(shingles)
    )


def shingle_hashes_col(shingles: Column) -> Column:
    """Hash each distinct shingle to int64 with xxhash64 (JVM, codegen).

    Downstream exact-Jaccard verification intersects these hashed sets
    (64-bit collisions are negligible at any realistic doc size), and the
    MinHash UDF consumes them as its element universe.
    """
    return F.transform(shingles, lambda s: F.xxhash64(s))


def content_hash_col(text: Column) -> Column:
    """Exact-duplicate key; analog of the blake3 file hash
    (file_hash_filesystem_cache.rs:39-56)."""
    return F.sha2(text, 256)


def char_shingles_col(text: Column, n: int) -> Column:
    """Distinct n-CHARACTER shingles of the normalized text — the shingle
    unit for unsegmented scripts (zh/ja/th web text carries no spaces, so
    whitespace tokens collapse to one giant token and every token-shingle
    operator goes blind; character n-grams are the standard remedy,
    Broder-style resemblance over char grams).

    Pure codegen: sequence + per-position substr + array_distinct — the
    char analogue of shingles_col.  Texts shorter than ``n`` chars yield
    an empty array (same NotEnoughFrames-analog contract)."""
    norm = normalize_text(text)
    m = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), m - n + 1),
        lambda i: norm.substr(i, F.lit(n)),
    )
    return F.when(m < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )
