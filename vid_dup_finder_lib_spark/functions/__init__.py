from vid_dup_finder_lib_spark.functions.text import (
    normalize_text,
    tokens_col,
    shingles_col,
    shingle_hashes_col,
    token_count_col,
)
from vid_dup_finder_lib_spark.functions.hashing import (
    minhash_udf_factory,
    simhash_udf_factory,
)

__all__ = [
    "normalize_text",
    "tokens_col",
    "shingles_col",
    "shingle_hashes_col",
    "token_count_col",
    "minhash_udf_factory",
    "simhash_udf_factory",
]
