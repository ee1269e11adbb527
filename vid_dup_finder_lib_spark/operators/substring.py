"""Long verbatim substring dedup (the north_star's suffix-array pass).

A classical suffix array is a single sorted global structure — the wrong
shape for a distributed engine.  The Spark-native equivalent for "find
document pairs sharing a verbatim token run of length >= L" is rolling
window hashing: every doc emits the set of hashes of its L-token windows
(distinct per doc), pairs sharing any window hash share a verbatim L-run
(modulo 64-bit collisions), and the shared-window count approximates overlap
mass.  The join is the same skew-aware shingle equi-join as ngram Jaccard —
one shuffle, no global structure.

Windows are optionally *winnowed* (Schleimer, Wilkerson & Aiken, "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003): in every run of
W consecutive window hashes, keep the minimum.  Selection depends only on
the local hash values, so it is self-synchronizing across documents: any
shared verbatim run of >= L + W - 1 tokens spans at least one full W-window
of identical hash values on both sides, whose minimum is selected by both —
a shared fingerprint is GUARANTEED, not merely expected (round-2 verdict
"What's wrong #4" replaced the old ``hash % W == 0`` mod-sampling, which
gave only expected coverage).  winnow=1 keeps everything (exact); callers at
10^12 scale pick W explicitly and report it (no silent caps).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions import sigkernel as sk
from vid_dup_finder_lib_spark.functions.text import normalize_text, tokens_col


def _window_hash_batch(
    ids: pa.Array, texts: pa.Array, L: int, winnow: int
) -> pa.RecordBatch:
    """(id, window_hashes array<long>) — distinct L-token window hashes."""
    import pyarrow.compute as pc
    import pandas as pd

    n = len(texts)
    norm = pc.utf8_lower(
        pc.utf8_trim(
            pc.replace_substring_regex(
                pc.fill_null(texts, ""), pattern=sk._WS_PATTERN, replacement=" "
            ),
            characters=" ",
        )
    )
    tokens = pc.split_pattern(norm, pattern=" ")
    raw_offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    raw_offsets = raw_offsets - raw_offsets[0]
    lengths = np.diff(raw_offsets)
    flat = tokens.flatten()
    empty_rows = pc.equal(norm, "").to_numpy(zero_copy_only=False)
    lengths = np.where(empty_rows, 0, lengths)

    if len(flat):
        denc = pc.dictionary_encode(flat)
        vocab = denc.dictionary.to_pandas().to_numpy(dtype=object)
        vocab_hash = pd.util.hash_array(vocab)
        th_all = vocab_hash[denc.indices.to_numpy(zero_copy_only=False)]
    else:
        th_all = np.empty(0, dtype=np.uint64)
    if empty_rows.any():
        keep = np.ones(len(th_all), dtype=bool)
        for i in np.flatnonzero(empty_rows):
            keep[raw_offsets[i] : raw_offsets[i + 1]] = False
        th = th_all[keep]
    else:
        th = th_all

    total = int(lengths.sum())
    row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
    if total >= L:
        comb = np.zeros(total - L + 1, dtype=np.uint64)
        for j in range(L):
            mult = sk._C1 if j < L - 1 else np.uint64(1)
            comb = comb * sk._C2 + th[j : total - L + 1 + j] * mult
        valid = row_of[: total - L + 1] == row_of[L - 1 :]
        w_rows = row_of[: total - L + 1][valid]
        w_vals = comb[valid]
    else:
        w_rows = np.empty(0, dtype=np.int64)
        w_vals = np.empty(0, dtype=np.uint64)

    if winnow > 1 and len(w_vals):
        # true winnowing: per doc, keep the min hash of every W-window of
        # consecutive window hashes (ties -> leftmost, deterministic on the
        # value sequence, so identical runs select identical values).  Docs
        # with fewer than W windows keep their single minimum, so every doc
        # with >= L tokens still emits at least one fingerprint.  w_rows is
        # non-decreasing by construction; the outer loop is per-doc with a
        # vectorized sliding-min inside (sliding_window_view is a stride
        # view — no O(n*W) copy).
        sel = np.zeros(len(w_vals), dtype=bool)
        starts = np.searchsorted(w_rows, np.arange(n))
        ends = np.searchsorted(w_rows, np.arange(n), side="right")
        for r in range(n):
            s, e = int(starts[r]), int(ends[r])
            cnt = e - s
            if cnt == 0:
                continue
            if cnt < winnow:
                sel[s + int(w_vals[s:e].argmin())] = True
            else:
                sw = np.lib.stride_tricks.sliding_window_view(w_vals[s:e], winnow)
                idx = sw.argmin(axis=1) + np.arange(cnt - winnow + 1) + s
                sel[idx] = True
        w_rows, w_vals = w_rows[sel], w_vals[sel]

    if len(w_vals):
        order = np.lexsort((w_vals, w_rows))
        sr, sv = w_rows[order], w_vals[order]
        first = np.ones(len(sv), dtype=bool)
        first[1:] = (sr[1:] != sr[:-1]) | (sv[1:] != sv[:-1])
        dr, dv = sr[first], sv[first]
    else:
        dr = np.empty(0, dtype=np.int64)
        dv = np.empty(0, dtype=np.uint64)

    counts = np.bincount(dr, minlength=n).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return pa.RecordBatch.from_arrays(
        [
            pc.cast(ids, pa.string()),
            sk._list_array(offs.astype(np.int32), dv.view(np.int64)),
        ],
        names=["id", "window_hashes"],
    )


def window_hashes(
    docs: DataFrame, L: int, id_col: str = "url", text_col: str = "text", winnow: int = 1
) -> DataFrame:
    """docs -> (id, window_hashes): distinct L-token rolling window hashes."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col))
            yield _window_hash_batch(ids, texts, L, winnow)

    out = docs.select(id_col, text_col).mapInArrow(
        fn, schema="id string, window_hashes array<long>"
    )
    id_type = docs.schema[id_col].dataType
    return out.withColumn("id", F.col("id").cast(id_type))


def substring_pairs(
    docs: DataFrame,
    L: int,
    min_shared_windows: int = 1,
    id_col: str = "url",
    text_col: str = "text",
    winnow: int = 1,
    max_window_df: int | None = None,
) -> DataFrame:
    """All pairs sharing >= min_shared_windows verbatim L-token windows.

    Returns (id1, id2, shared_windows).  ``max_window_df`` quarantines
    boilerplate windows above a document-frequency cap from pair generation
    (the same explicit skew valve as ngram_jaccard_pairs — callers must
    report it, never default it on).
    """
    wh = window_hashes(docs, L, id_col, text_col, winnow)
    ex = wh.select("id", F.explode("window_hashes").alias("wh"))
    if max_window_df is not None:
        hot = ex.groupBy("wh").agg(F.count("*").alias("df")).where(F.col("df") > max_window_df)
        ex = ex.join(F.broadcast(hot.select("wh")), "wh", "left_anti")
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), "wh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count("*").alias("shared_windows"))
        .where(F.col("shared_windows") >= min_shared_windows)
    )
    return pairs


def _diagonal_runs(
    pairs: DataFrame,
    tokens: DataFrame,
    k: int,
    id_col: str,
    toks_col: str,
    id1: str,
    id2: str,
    max_gram_repeat: int,
    caller: str,
) -> DataFrame:
    """Shared core of the pair-substring family: every maximal common token
    run of length >= k per pair, as ``(id1, id2, run_len, s1, s2)`` —
    diagonal islands of the positional k-gram match matrix (see
    pair_token_lcs for the equivalence argument and the valve contract)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    toks = F.col(toks_col)
    n = F.size(toks)
    gram_arr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))

    docs_in = (
        pairs.select(F.col(id1).alias("__id"))
        .unionByName(pairs.select(F.col(id2).alias("__id")))
        .distinct()
    )
    grams = (
        tokens.join(docs_in, tokens[id_col] == docs_in["__id"], "left_semi")
        .select(F.col(id_col).alias("__gid"), F.posexplode(gram_arr).alias("pos", "gram"))
    ).localCheckpoint(eager=True)

    worst = grams.groupBy("__gid", "gram").count().agg(F.max("count")).collect()[0][0]
    if worst is not None and worst > max_gram_repeat:
        raise ValueError(
            f"{caller}: a {k}-gram repeats {worst}x inside one doc "
            f"(cap {max_gram_repeat}) — the match join would be quadratic in "
            "that count; raise max_gram_repeat explicitly or pre-strip the "
            "boilerplate"
        )

    p = pairs.select(id1, id2)
    m = (
        p.join(grams.select(F.col("__gid"), F.col("pos").alias("i"), "gram"),
               F.col(id1) == F.col("__gid"))
        .drop("__gid")
        .join(
            grams.select(F.col("__gid"), F.col("pos").alias("j"),
                         F.col("gram").alias("__g2")),
            (F.col(id2) == F.col("__gid")) & (F.col("gram") == F.col("__g2")),
        )
        .select(id1, id2, "i", "j")
    )
    w = Window.partitionBy(id1, id2, F.col("i") - F.col("j")).orderBy("i")
    return (
        m.withColumn("__isl", F.col("i") - F.row_number().over(w))
        .groupBy(id1, id2, (F.col("i") - F.col("j")).alias("__d"), "__isl")
        .agg(
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("run_len"),
            F.min("i").cast("long").alias("s1"),
            F.min("j").cast("long").alias("s2"),
        )
        .drop("__d", "__isl")
    )


def pair_token_lcs(
    pairs: DataFrame,
    tokens: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    id1: str = "id1",
    id2: str = "id2",
    max_gram_repeat: int = 1_000,
    runs: DataFrame | None = None,
) -> DataFrame:
    """Exact longest common token RUN per candidate pair — the "how long is
    the shared passage, and where" number behind the substring family's
    booleans (window_hashes says pairs SHARE an L-run; this measures the
    longest one — the reference GUI's side-by-side matched-region view,
    quantified).

    No suffix structure: LCS-of-substring over token sequences is
    equivalently the longest DIAGONAL ISLAND in the positional k-gram match
    matrix — every common run of length R >= k appears as exactly R-k+1
    consecutive (i, j) matches with constant i-j, so

        lcs_tokens = max island length + k - 1.

    That makes it a composition of existing relational ops: positional
    k-gram explode, equi-join on the gram (the skew shape of every other
    shingle join here), and a gaps-and-islands window per (pair, diagonal)
    — all JVM-side, no Python, and expressible 1:1 in ANSI SQL for the
    oracle gate.  Runs SHORTER than k are invisible by design: output 0 /
    null starts for such pairs (the substring-dedup question is "is there a
    LONG shared passage"; k is the noise floor, documented contract).

    Tie-break: among maximal runs, the smallest ``start1``, then the
    smallest ``start2`` (0-based token offsets).

    Valve: a k-gram repeated more than ``max_gram_repeat`` times INSIDE one
    doc (degenerate boilerplate: the same 8 tokens thousands of times)
    would make the match join quadratic in that count; it RAISES with the
    measured maximum rather than running silently (range_join's fail-fast
    discipline).  Cross-doc frequency is irrelevant — the join is
    restricted to verified pairs, not all docs.

    Scale shape: gram tables are built only for docs present in ``pairs``
    (semi-join pruned), the match join shuffles on (doc id, gram), and the
    island window is partitioned by (pair, diagonal) — never unpartitioned.
    Output: ``(id1, id2, lcs_tokens, start1, start2)``, one row per input
    pair (0 / null when no common run reaches k).

    ``runs``: optionally pass a precomputed ``_diagonal_runs`` table to
    share the (explode + match join + island window) core with
    ``pair_verbatim_coverage`` over the same pairs/tokens/k — the fusion
    ``api.explain_pair`` uses so the expensive subtree executes once.
    """
    p = pairs.select(id1, id2)
    if runs is None:
        runs = _diagonal_runs(
            pairs, tokens, k, id_col, toks_col, id1, id2, max_gram_repeat,
            caller="pair_token_lcs",
        )
    best = runs.groupBy(id1, id2).agg(
        F.min(F.struct((-F.col("run_len")).alias("a"),
                       F.col("s1").alias("b"),
                       F.col("s2").alias("c"))).alias("st")
    )
    return (
        p.join(best, [id1, id2], "left")
        .select(
            id1,
            id2,
            F.coalesce(-F.col("st.a"), F.lit(0).cast("long")).alias("lcs_tokens"),
            F.col("st.b").alias("start1"),
            F.col("st.c").alias("start2"),
        )
    )


def _interval_union_len(
    runs: DataFrame, id1: str, id2: str, start_col: str, out: str
) -> DataFrame:
    """Per pair: total token count covered by the UNION of the run
    intervals [start, start + run_len - 1] — overlapping runs (the same
    passage matched on several diagonals) must not double-count, hence the
    classic sort + sweep (gaps-and-islands over running max end), windowed
    per pair, never unpartitioned."""
    from pyspark.sql import Window

    iv = runs.select(
        id1, id2,
        F.col(start_col).alias("s"),
        (F.col(start_col) + F.col("run_len") - 1).alias("e"),
    )
    w = Window.partitionBy(id1, id2).orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    per = (
        iv.withColumn("__grp", grp)
        .groupBy(id1, id2, "__grp")
        .agg((F.max("e") - F.min("s") + 1).alias("len"))
    )
    return per.groupBy(id1, id2).agg(F.sum("len").cast("long").alias(out))


def _span_base(
    docs: DataFrame, text_col: str, id_col: str, preserve_case: bool
) -> DataFrame:
    """(__id, __toks, n_tokens) under the span family's tokenization rule
    (null text == empty; whitespace collapse; lowercase unless
    ``preserve_case``)."""
    filled = F.coalesce(F.col(text_col), F.lit(""))
    if preserve_case:
        collapsed = F.trim(F.regexp_replace(filled, r"[ \t\n\r\f\x0B]+", " "))
        toks = F.when(
            F.length(collapsed) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(collapsed, " "))
    else:
        toks = tokens_col(normalize_text(filled))
    return docs.select(
        F.col(id_col).alias("__id"),
        toks.alias("__toks"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def _noncanonical_dup_occurrences(
    base: DataFrame, k: int, preserve_case: bool
) -> DataFrame:
    """Shared core of the span family: every positional k-gram occurrence
    that is duplicated (count >= 2 corpus-wide) and NOT the canonical
    (min (id, pos)) one — ``(__id, pos, __canon)`` with ``__canon`` the
    canonical (i, p) struct.  One map-side-combinable shuffle on the gram
    key + the join-back (AQE broadcasts the dup-stats side when small)."""
    gram_key = (
        (lambda i: F.md5(F.lower(F.concat_ws(" ", F.slice("__toks", i + 1, k)))))
        if preserve_case
        else (lambda i: F.md5(F.concat_ws(" ", F.slice("__toks", i + 1, k))))
    )
    gram_arr = F.when(
        F.size("__toks") >= k,
        F.transform(F.sequence(F.lit(0), F.size("__toks") - k), gram_key),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("__id", F.posexplode(gram_arr).alias("pos", "gram"))
    stats = occ.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct(F.col("__id").alias("i"), F.col("pos").alias("p"))).alias("__canon"),
    )
    return (
        occ.join(stats.where(F.col("__cnt") >= 2), "gram")
        .where(
            ~((F.col("__id") == F.col("__canon.i")) & (F.col("pos") == F.col("__canon.p")))
        )
        .select("__id", "pos", "__canon")
    )


def duplicate_span_sources(
    docs: DataFrame,
    k: int,
    id_col: str = "url",
    text_col: str = "text",
    preserve_case: bool = False,
) -> DataFrame:
    """The explain surface of :func:`duplicate_span_rewrite`: for every
    maximal duplicated run, WHERE it came from — one row per (document,
    source, diagonal) island: ``(id, start, span_tokens, src_id,
    src_start)`` meaning tokens ``[start, start + span_tokens)`` of ``id``
    also appear verbatim at ``src_start`` of the canonical doc ``src_id``
    (the reference GUI's side-by-side matched-region view, corpus-global —
    explain_pair answers the same question for ONE pair).

    Consecutive non-canonical occurrences whose canonical source advances
    in lockstep (same ``(id, src_id, pos - src_pos)`` diagonal) merge into
    one maximal span via the usual gaps-and-islands window; a span whose
    per-gram canonicals alternate between sources splits at the
    alternation, by construction.  Rows cover exactly the grams the
    rewrite cuts: the interval union of ``[start, start + span_tokens)``
    over a doc's rows equals that doc's removed intervals.

    Scale shape: the shared gram agg + join-back
    (:func:`_noncanonical_dup_occurrences`), then one window partitioned
    by (doc, source, diagonal) over DUPLICATED occurrences only — never
    the full occurrence table.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    base = _span_base(docs, text_col, id_col, preserve_case)
    dup = _noncanonical_dup_occurrences(base, k, preserve_case).select(
        "__id",
        "pos",
        F.col("__canon.i").alias("__src"),
        F.col("__canon.p").alias("__spos"),
    )
    w = Window.partitionBy("__id", "__src", F.col("pos") - F.col("__spos")).orderBy("pos")
    isl = F.col("pos") - F.row_number().over(w)
    return (
        dup.withColumn("__isl", isl)
        .groupBy("__id", "__src", (F.col("pos") - F.col("__spos")).alias("__d"), "__isl")
        .agg(
            F.min("pos").cast("long").alias("start"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_tokens"),
            F.min("__spos").cast("long").alias("src_start"),
        )
        .select(
            F.col("__id").alias(id_col),
            "start",
            "span_tokens",
            F.col("__src").alias("src_id"),
            "src_start",
        )
    )


def duplicate_span_rewrite(
    docs: DataFrame,
    k: int,
    id_col: str = "url",
    text_col: str = "text",
    preserve_case: bool = False,
) -> DataFrame:
    """Corpus-level verbatim-span dedup: remove every duplicated run of
    >= k tokens from all but its globally-first occurrence, and rewrite
    the surviving text (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022 — the ExactSubstr pass their suffix
    array computes, re-expressed relationally).

    Semantics (deterministic, mirrored 1:1 by the DuckDB oracle):

    * every positional k-token gram is an occurrence ``(id, pos)``;
    * a gram occurring >= 2 times anywhere (cross- OR intra-document) is
      duplicated; its canonical occurrence is the minimum ``(id, pos)``;
    * every NON-canonical occurrence of a duplicated gram covers token
      interval ``[pos, pos + k - 1]``; per document the covered intervals
      merge (interval union), and covered tokens are cut from the text.
      A duplicated span of length R >= k is covered by all R - k + 1 of
      its grams, so the whole maximal span disappears from non-canonical
      copies while the canonical copy survives verbatim.  Spans shorter
      than k are invisible by design (k is the noise floor — the
      published pass uses 50 BPE tokens).

    Scale shape — and why this, not the pair family, is the suffix-array
    dedup path at 10^12 docs: the plan is O(total tokens) end to end.
    Gram occurrences shuffle ONCE on the gram key into a map-side-
    combinable agg (count + min-struct), join back once (AQE handles the
    boilerplate-gram skew — the hot row fans out, it never pairs), the
    interval merge windows per document (bounded by that doc's dup
    occurrences), and the rewrite is a per-row codegen expression.  No
    candidate pair is ever materialized, unlike substring_pairs whose
    bucket join is quadratic in per-gram df.  Grams are keyed by md5
    (128-bit; equality-preserving for the oracle, 4-8x narrower than the
    raw k-token string on the shuffle wire).

    Output: one row per input document —
    ``(id, n_tokens, removed_tokens, kept_text, removed_ppm)`` with
    ``removed_ppm`` via exact integral division (the repo's ppm rule).

    ``preserve_case=True``: duplication is still judged on the NORMALIZED
    (lowercased) token stream — "Foo Bar" and "foo bar" are the same span,
    the same rule every signature operator here applies — but the
    surviving text is rebuilt from the ORIGINAL-case tokens (whitespace
    still collapses to single spaces: token positions must line up with
    the gram positions).  This is the published pass's behavior (the
    suffix array is built over the raw bytes of kept text); the default
    ``False`` emits normalized text like the other rewrite stages
    (paragraph dedup) and is what the oracle twin mirrors.

    Reference parity: the reference dedups whole videos and has no
    sub-item rewrite; this extends its matchset "consume the duplicate"
    semantics (matchset_fns.rs:37-120) to within-document spans, per the
    north_star's suffix-array clause.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    base = _span_base(docs, text_col, id_col, preserve_case)

    dup_occ = _noncanonical_dup_occurrences(base, k, preserve_case).select(
        "__id", F.col("pos").alias("s"), (F.col("pos") + k - 1).alias("e")
    )

    # classic sort + sweep interval union, windowed per document (dup
    # occurrences of one doc, never unpartitioned)
    w = Window.partitionBy("__id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    cuts = (
        dup_occ.withColumn("__grp", grp)
        .groupBy("__id", "__grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("__id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__cuts"))
    )

    merged = base.join(cuts, "__id", "left").withColumn(
        "__cuts", F.coalesce("__cuts", F.array().cast("array<struct<s:long,e:long>>"))
    )
    with_pos = F.transform(
        "__toks", lambda x, i: F.struct(x.alias("t"), i.cast("long").alias("i"))
    )
    kept = F.transform(
        F.filter(
            with_pos,
            lambda st: ~F.exists(
                "__cuts", lambda iv: (st["i"] >= iv["s"]) & (st["i"] <= iv["e"])
            ),
        ),
        lambda st: st["t"],
    )
    removed = F.aggregate(
        "__cuts",
        F.lit(0).cast("long"),
        lambda acc, iv: acc + iv["e"] - iv["s"] + F.lit(1),
    )
    # removed_ppm via F.expr over the FIXED internal columns and the id
    # projected with F.col: interpolating id_col into selectExpr broke on
    # names needing backticks (space/hyphen/dot) even though the rest of
    # the operator handles arbitrary names (ADVICE r5)
    return merged.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        removed.alias("removed_tokens"),
        F.array_join(kept, " ").alias("kept_text"),
    ).withColumn(
        "removed_ppm",
        F.expr(
            "cast((removed_tokens * 1000000) div greatest(n_tokens, 1) as long)"
        ),
    )


def pair_verbatim_coverage(
    pairs: DataFrame,
    tokens: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    id1: str = "id1",
    id2: str = "id2",
    max_gram_repeat: int = 1_000,
    runs: DataFrame | None = None,
) -> DataFrame:
    """Per candidate pair: what FRACTION of each document is verbatim-shared
    (in runs of >= k tokens) with the other — the number dedup policies
    actually threshold on ("drop if more than half the doc is copied"),
    where pair_token_lcs answers only "how long is the longest passage".

    Same diagonal-island core (exact, relational, valve-raising); the runs
    then collapse into per-document covered-token counts via interval-union
    sweep (overlaps between runs never double-count).  Output one row per
    input pair: ``(id1, id2, n_tokens1, n_tokens2, covered1, covered2,
    coverage1_ppm, coverage2_ppm)`` — integer ppm via exact long division.

    Scale shape: everything from pair_token_lcs plus two windows
    partitioned by (pair) over run rows only (runs per pair are few — they
    are maximal islands, not matches).  ``runs`` shares a precomputed
    ``_diagonal_runs`` table exactly as in :func:`pair_token_lcs`.
    """
    if runs is None:
        # materialized because BOTH per-side sweeps consume it — without
        # this the gram match join + island window execute twice (the
        # repo's multi-consumer rule; runs are few, maximal islands)
        runs = _diagonal_runs(
            pairs, tokens, k, id_col, toks_col, id1, id2, max_gram_repeat,
            caller="pair_verbatim_coverage",
        ).localCheckpoint(eager=True)
    c1 = _interval_union_len(runs, id1, id2, "s1", "covered1")
    c2 = _interval_union_len(runs, id1, id2, "s2", "covered2")
    nt = tokens.select(
        F.col(id_col).alias("__nid"), F.size(F.col(toks_col)).cast("long").alias("__n")
    )
    # LEFT joins: a pair referencing a doc absent from ``tokens`` keeps its
    # row with zero token counts (and hence zero coverage) — the repo's
    # no-silent-drop rule; an inner join here would quietly shrink the
    # output below one-row-per-input-pair
    p = (
        pairs.select(id1, id2)
        .join(
            nt.withColumnRenamed("__n", "n_tokens1"),
            F.col(id1) == F.col("__nid"),
            "left",
        )
        .drop("__nid")
        .join(
            nt.withColumnRenamed("__n", "n_tokens2"),
            F.col(id2) == F.col("__nid"),
            "left",
        )
        .drop("__nid")
        .select(
            id1,
            id2,
            F.coalesce("n_tokens1", F.lit(0)).cast("long").alias("n_tokens1"),
            F.coalesce("n_tokens2", F.lit(0)).cast("long").alias("n_tokens2"),
        )
    )
    return (
        p.join(c1, [id1, id2], "left")
        .join(c2, [id1, id2], "left")
        .select(
            id1,
            id2,
            "n_tokens1",
            "n_tokens2",
            F.coalesce("covered1", F.lit(0)).cast("long").alias("covered1"),
            F.coalesce("covered2", F.lit(0)).cast("long").alias("covered2"),
        )
        .selectExpr(
            id1,
            id2,
            "n_tokens1",
            "n_tokens2",
            "covered1",
            "covered2",
            "cast((covered1 * 1000000) div greatest(n_tokens1, 1) as long) as coverage1_ppm",
            "cast((covered2 * 1000000) div greatest(n_tokens2, 1) as long) as coverage2_ppm",
        )
    )
