"""Single-pass Arrow signature kernel: text -> full signature record.

Why this exists: Spark's higher-order array functions (transform / slice /
concat_ws) are *interpreted per element*, not whole-stage-codegen'd — building
k-token shingles that way measured ~9k shingles/s/core, 30x slower than the
rest of the plan.  The reference hit the same wall in its hot loop and
hand-vectorized it (``frame_change.rs:46-49``); the Spark-native equivalent
is one ``mapInArrow`` pass where nothing row-sized ever becomes a Python
object:

    normalize + split        pyarrow.compute (C++, RE2)
    token hashing            dictionary-encode, hash only the vocab
                             (pd.util.hash_array, siphash), gather
    shingle combine          rolling uint64 polynomial over the flat array
    per-row distinct         one global lexsort + boundary mask
    MinHash / SimHash        np.minimum/add.reduceat (functions/hashing.py)
    list outputs             pa.ListArray.from_arrays (zero-copy)

Tokenization contract (must equal the JVM normalize_text/tokens_col pair and
the DuckDB oracle): lowercase, trim, collapse ASCII whitespace
``[ \\t\\n\\r\\f\\v]+`` to single spaces, split on single space.  The shingle
*values* are engine-internal (only set equality/cardinality is observable),
so the polynomial combine does not need to match xxhash64.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.hashing import minhash_signatures, simhash_values

_WS_PATTERN = r"[ \t\n\r\f\v]+"

# odd 64-bit mixing constants for the positional shingle combine
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)

ERR_TOO_SHORT = "NotEnoughTokens"
ERR_NULL_TEXT = "NullText"


def _list_array(offsets: np.ndarray, values: np.ndarray, null_mask=None) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(values, type=pa.int64()),
        mask=pa.array(null_mask) if null_mask is not None else None,
    )


def compute_signatures_arrow(
    ids: pa.Array,
    texts: pa.Array,
    cfg: SigConfig,
    include_token_hashes: bool = True,
    content_hash: pa.Array | None = None,
) -> pa.RecordBatch:
    """``content_hash`` is a passthrough column computed JVM-side
    (``F.sha2(text, 256)`` in operators/signatures.py) so that no row ever
    becomes a Python object here.  Direct callers must supply it (null-array
    allowed); there is deliberately NO Python hashing fallback — the kernel
    contains zero per-row Python."""
    n = len(texts)
    null_mask = pc.is_null(texts).to_numpy(zero_copy_only=False)

    norm = pc.utf8_lower(
        pc.utf8_trim(
            pc.replace_substring_regex(
                pc.fill_null(texts, ""), pattern=_WS_PATTERN, replacement=" "
            ),
            characters=" ",
        )
    )
    tokens = pc.split_pattern(norm, pattern=" ")
    tokens = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens

    raw_offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    raw_offsets = raw_offsets - raw_offsets[0]
    lengths = np.diff(raw_offsets)
    flat = tokens.flatten()

    # '' splits to [''] — canonicalize those rows to zero tokens
    empty_rows = pc.equal(norm, "").to_numpy(zero_copy_only=False)
    lengths = np.where(empty_rows, 0, lengths)

    # token hashing: hash only the batch vocabulary, then gather
    if len(flat):
        denc = pc.dictionary_encode(flat)
        vocab = denc.dictionary.to_pandas().to_numpy(dtype=object)
        vocab_hash = pd.util.hash_array(vocab)  # uint64 siphash, fixed key
        indices = denc.indices.to_numpy(zero_copy_only=False)
        th_all = vocab_hash[indices]
    else:
        th_all = np.empty(0, dtype=np.uint64)

    # drop the phantom '' tokens of empty rows from the flat view
    # (vectorized: expand the per-row mask to token positions via repeat)
    if empty_rows.any():
        th = th_all[~np.repeat(empty_rows, np.diff(raw_offsets))]
    else:
        th = th_all
    # content-sampling policy (S5 analog, video_hash_builder.rs:85-157):
    # signature covers tokens [skip, skip+max) with short-doc fallback;
    # doclen keeps the FULL count (it is the duration band key, not the
    # hashed extent — mirroring the reference exactly)
    full_lengths = lengths
    if cfg.skip_tokens > 0 or cfg.max_tokens is not None:
        starts = np.where(lengths > cfg.skip_tokens, cfg.skip_tokens, 0).astype(np.int64)
        ends = lengths if cfg.max_tokens is None else np.minimum(lengths, starts + cfg.max_tokens)
        pre_offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=pre_offsets[1:])
        pos = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(pre_offsets, lengths)
        keep_w = (pos >= np.repeat(starts, lengths)) & (pos < np.repeat(ends, lengths))
        th = th[keep_w]
        lengths = (ends - starts).astype(np.int64)

    total = int(lengths.sum())
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])

    k = cfg.shingle_k
    row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)

    if total >= k:
        comb = np.zeros(total - k + 1, dtype=np.uint64)
        for j in range(k):
            mult = _C1 if j < k - 1 else np.uint64(1)
            comb = comb * _C2 + th[j : total - k + 1 + j] * mult
        valid = row_of[: total - k + 1] == row_of[k - 1 :]
        sh_rows = row_of[: total - k + 1][valid]
        sh_vals = comb[valid]
    else:
        sh_rows = np.empty(0, dtype=np.int64)
        sh_vals = np.empty(0, dtype=np.uint64)

    if len(sh_vals):
        order = np.lexsort((sh_vals, sh_rows))
        sr, sv = sh_rows[order], sh_vals[order]
        first = np.ones(len(sv), dtype=bool)
        first[1:] = (sr[1:] != sr[:-1]) | (sv[1:] != sv[:-1])
        dr, dv = sr[first], sv[first]
    else:
        dr = np.empty(0, dtype=np.int64)
        dv = np.empty(0, dtype=np.uint64)

    sh_counts = np.bincount(dr, minlength=n).astype(np.int64)
    d_offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(sh_counts[:-1], out=d_offsets[1:])
    dv_i64 = dv.view(np.int64)

    mh = minhash_signatures(dv_i64, d_offsets, sh_counts, cfg.num_perms, cfg.seed)
    sh64 = simhash_values(dv_i64, d_offsets, sh_counts, cfg.simhash_bits)

    err_mask = null_mask | (sh_counts == 0)
    errors = np.where(
        null_mask, ERR_NULL_TEXT, np.where(sh_counts == 0, ERR_TOO_SHORT, None)
    )

    if content_hash is None:
        raise ValueError(
            "content_hash must be supplied (compute it JVM-side with "
            "F.sha2(text, 256) as operators/signatures.py does); the Arrow "
            "kernel never materializes document text as Python objects"
        )

    if include_token_hashes:
        tok_list_offsets = np.concatenate([offsets, [total]]).astype(np.int32)
        tok_arr = _list_array(tok_list_offsets, th.view(np.int64))
    else:
        # positional token arrays are by far the widest column; skip them
        # when the caller's verify path is Jaccard-only
        tok_arr = _list_array(
            np.zeros(n + 1, dtype=np.int32), np.empty(0, dtype=np.int64)
        )
    sh_list_offsets = np.concatenate([d_offsets, [len(dv_i64)]]).astype(np.int32)
    # minhash rows are fixed-width num_perms; error rows become null lists
    mh_flat = mh[~err_mask].reshape(-1)
    mh_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.where(~err_mask, cfg.num_perms, 0), out=mh_offsets[1:])

    return pa.RecordBatch.from_arrays(
        [
            pc.cast(ids, pa.string()),
            pa.array(full_lengths, type=pa.int64()),
            tok_arr,
            pa.array(sh_counts, type=pa.int64()),
            _list_array(sh_list_offsets, dv_i64),
            _list_array(mh_offsets.astype(np.int32), mh_flat, null_mask=err_mask),
            pa.array(
                np.where(err_mask, 0, sh64), type=pa.int64(), mask=err_mask
            ),
            content_hash.combine_chunks()
            if isinstance(content_hash, pa.ChunkedArray)
            else content_hash,
            pa.array(errors.tolist(), type=pa.string()),
        ],
        names=[
            "id", "doclen", "token_hashes", "shingle_count", "shingle_hashes",
            "minhash", "simhash", "content_hash", "error",
        ],
    )


def signature_map_fn(
    cfg: SigConfig,
    id_col: str,
    text_col: str,
    include_token_hashes: bool = True,
    cpu_acc=None,
):
    """``cpu_acc``: optional Spark accumulator collecting the kernel's
    Python-worker CPU seconds (time.process_time) — the core-seconds
    instrumentation the scaling evidence uses (JVM executorCpuTime cannot
    see Python-side work).  None = zero overhead."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import time

        for batch in batches:
            t0 = time.process_time() if cpu_acc is not None else 0.0
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col))
            ch_idx = batch.schema.get_field_index("content_hash")
            ch = batch.column(ch_idx) if ch_idx >= 0 else None
            out = compute_signatures_arrow(ids, texts, cfg, include_token_hashes, ch)
            if cpu_acc is not None:
                cpu_acc.add(time.process_time() - t0)
            yield out

    return fn


SIGNATURE_SCHEMA = (
    "id string, doclen long, token_hashes array<long>, shingle_count long, "
    "shingle_hashes array<long>, minhash array<long>, simhash long, "
    "content_hash string, error string"
)
