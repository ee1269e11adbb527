"""docs -> signatures: the hash-build stage.

Analog of the reference's ``gen_hash`` driver
(``vid_dup_finder_lib/src/video_hashing/video_hash_builder.rs:214-223``):
one pass that turns each document into a fixed-size signature record, with
errors captured as *values* (an ``error`` column) rather than raised — the
reference caches ``Result<VideoHash, Error>`` the same way
(``generic_cache_if.rs:22-45``).

Physical shape: a single narrow projection — normalize/tokenize/shingle are
Catalyst expressions (whole-stage codegen); only the MinHash/SimHash
reductions cross to Python via Arrow.  No shuffle is introduced: the stage is
embarrassingly parallel over input partitions, which is what makes it scale
linearly to 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.hashing import (
    minhash_udf_factory,
    simhash_udf_factory,
)
from vid_dup_finder_lib_spark.functions.text import (
    content_hash_col,
    normalize_text,
    shingle_hashes_col,
    shingles_col,
    tokens_col,
)

ERR_TOO_SHORT = "NotEnoughTokens"  # NotEnoughFrames analog (video_hashing/mod.rs:17-28)
ERR_NULL_TEXT = "NullText"         # NotVideo analog


def build_signatures(
    docs: DataFrame,
    cfg: SigConfig,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Returns ``(id, doclen, shingle_count, shingle_hashes, minhash,
    simhash, content_hash, error)``.

    ``doclen`` (token count) plays the role of the reference's ``duration``
    band key (video_hash.rs:31); ``content_hash`` the blake3 exact-dup key
    (file_hash_filesystem_cache.rs:39-56).
    """
    minhash_udf = minhash_udf_factory(cfg.num_perms, cfg.seed)
    simhash_udf = simhash_udf_factory(cfg.simhash_bits)

    norm = normalize_text(F.col(text_col))
    toks = tokens_col(norm)

    stage1 = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("doclen"),
        # positional token hashes: the bitvector for token-Hamming verify
        F.transform(toks, lambda t: F.xxhash64(t)).alias("token_hashes"),
        shingle_hashes_col(shingles_col(toks, cfg.shingle_k)).alias("shingle_hashes"),
        content_hash_col(F.col(text_col)).alias("content_hash"),
        F.col(text_col).isNull().alias("_null_text"),
    )

    return stage1.select(
        "id",
        "doclen",
        "token_hashes",
        F.size("shingle_hashes").cast("long").alias("shingle_count"),
        "shingle_hashes",
        F.when(F.size("shingle_hashes") > 0, minhash_udf("shingle_hashes")).alias("minhash"),
        F.when(F.size("shingle_hashes") > 0, simhash_udf("shingle_hashes")).alias("simhash"),
        "content_hash",
        F.when(F.col("_null_text"), F.lit(ERR_NULL_TEXT))
        .when(F.size("shingle_hashes") == 0, F.lit(ERR_TOO_SHORT))
        .alias("error"),
    )
