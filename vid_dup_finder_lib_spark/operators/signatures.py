"""docs -> signatures: the hash-build stage.

Analog of the reference's ``gen_hash`` driver
(``vid_dup_finder_lib/src/video_hashing/video_hash_builder.rs:214-223``):
one pass that turns each document into a fixed-size signature record, with
errors captured as *values* (an ``error`` column) rather than raised — the
reference caches ``Result<VideoHash, Error>`` the same way
(``generic_cache_if.rs:22-45``).

Physical shape: a single ``mapInPandas`` projection over input partitions —
no shuffle — with the whole tokenize→shingle→MinHash/SimHash chain flat-numpy
vectorized inside one Arrow pass (functions/sigkernel.py; Spark's
higher-order array functions are interpreted per element and measured 30x
slower here).  Embarrassingly parallel, which is what makes this stage scale
linearly to 10^12 docs.

Note: ``id`` is surfaced as StringType regardless of the input id type (the
kernel schema is static); numeric ids round-trip losslessly via cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.sigkernel import (
    ERR_NULL_TEXT,
    ERR_TOO_SHORT,
    SIGNATURE_SCHEMA,
    signature_map_fn,
)

__all__ = ["build_signatures", "ERR_NULL_TEXT", "ERR_TOO_SHORT"]


def build_signatures(
    docs: DataFrame,
    cfg: SigConfig,
    id_col: str = "url",
    text_col: str = "text",
    include_token_hashes: bool = True,
    cpu_acc=None,
    unit: str = "token",
) -> DataFrame:
    """Returns ``(id, doclen, token_hashes, shingle_count, shingle_hashes,
    minhash, simhash, content_hash, error)``.

    ``doclen`` (token count) plays the role of the reference's ``duration``
    band key (video_hash.rs:31); ``content_hash`` the blake3 exact-dup key
    (file_hash_filesystem_cache.rs:39-56).

    ``unit="char"`` — the unsegmented-script (zh/ja/th) mode: the text is
    exploded into space-separated CHARACTERS by a codegen projection
    before the (unchanged, fixture-frozen) Arrow kernel, so every
    downstream stage — MinHash, LSH bands, length band, verify, matchsets,
    the store — operates on character ``cfg.shingle_k``-grams with doclen
    = character count (the right band key where whitespace tokens carry no
    signal).  Spaces in the input are NOT characters under this mode (they
    vanish with the split — unsegmented content carries none; mixed text
    loses only its separator positions).  ``content_hash`` is always the
    sha2 of the ORIGINAL text, so exact-dup identity is unit-independent.
    One engine, one kernel, two granularities by composition.
    """
    from pyspark.sql import functions as F

    if unit not in ("token", "char"):
        raise ValueError(f"unknown signature unit {unit!r} (token | char)")

    # content_hash is computed JVM-side (codegen sha2 over the UTF-8 bytes —
    # identical value to hashlib.sha256(text.encode()).hexdigest()) and passed
    # through the Arrow kernel untouched: the signature stage never turns a
    # document into a Python object.
    # dataframe-qualified refs, NOT F.col: the spaced text is aliased to
    # text_col in the same select, and lateral column alias resolution
    # would bind a bare F.col(text_col) in the sha2 to the ALIASED (spaced)
    # value — silently changing the exact-dup key (the q_pair_lcs hazard)
    kernel_text = (
        F.regexp_replace(docs[text_col], r"(?s)(.)", "$1 ")
        if unit == "char"
        else docs[text_col]
    )
    narrow = docs.select(
        id_col,
        kernel_text.alias(text_col),
        F.sha2(docs[text_col], 256).alias("content_hash"),
    )
    out = narrow.mapInArrow(
        signature_map_fn(cfg, id_col, text_col, include_token_hashes, cpu_acc),
        schema=SIGNATURE_SCHEMA,
    )
    # the Arrow kernel's schema is static (id: string); restore the input id
    # type so ordering semantics (pair normalization, CC min-label) match the
    # caller's key domain — '100002' < '2' as strings, not as numbers

    id_type = docs.schema[id_col].dataType
    return out.withColumn("id", F.col("id").cast(id_type))
