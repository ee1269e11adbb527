"""Boilerplate strip — the letterbox-crop analog (SURVEY.md §2.2 P3/P4).

The reference detects letterbox bars by walking in from each frame edge while
the strip stays near-uniform (``vid_dup_finder_common/src/video_frames_gray.rs
:38-128``), then takes the **union (per-side min) of the per-frame crops
across the sampled sequence** (``video_frames_gray.rs:201-210``,
``Crop::union`` ``crop.rs:53-68``) so only bars present in *every* frame are
removed.

Text analog: web boilerplate (nav bars, cookie banners, copyright footers) is
high-document-frequency *lines* hugging the document edges.  The strip:

* a line is boilerplate iff its corpus document frequency clears a threshold
  (the "strip is near-uniform across the corpus" test — df plays the role of
  the >=90 %-uniform strip rule);
* per document, walk in from the **top and bottom only**: strip the maximal
  boilerplate prefix and suffix, never interior lines (the crop semantics —
  a letterbox crop can only remove edges, not the middle of a frame).

Everything is built-in DataFrame ops (posexplode / groupBy / join) — one
shuffle for the df count, one for the per-doc bounds, one for reassembly; no
Python in the path.  At 100 TB the df table is corpus-wide but tiny (distinct
lines with df above threshold), and the reassembly groupBy is keyed on doc id
— the same key the signature stage consumes next, so AQE can co-partition.

Wired as an *optional pre-signature stage* (api.search(strip_boilerplate=...)
/ plans.pipeline) — CLI-default parity keeps it off, exactly as the
reference defaults to ``Cropdetect::None`` (``arg_parse.rs:543-547``).
This operator is also the at-the-source fix for LSH mega-buckets: boilerplate
shingles are what collapse distinct docs into the same band buckets
(operators/lsh.py quarantine tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["boilerplate_lines", "strip_boilerplate", "strip_frequent_lines"]


def _doc_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line): one row per line, split on '\\n' (empty text -> one
    empty line, like str.split)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def boilerplate_lines(
    docs: DataFrame,
    min_df_num: int = 1,
    min_df_den: int = 2,
    id_col: str = "url",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """Lines whose document frequency >= (min_df_num/min_df_den) of the
    corpus.  Returns (line, df).  The threshold is exact integer
    cross-multiplication (no float ratios), same convention as the Jaccard
    predicates.

    ``n_docs`` may be passed when the caller already knows the corpus size
    (saves a count job); it is a scalar, never a collected table.
    """
    total = docs.count() if n_docs is None else n_docs
    df_tab = (
        _doc_lines(docs, id_col, text_col)
        .groupBy("line")
        .agg(F.countDistinct("id").alias("df"))
    )
    return df_tab.where(F.col("df") * min_df_den >= F.lit(total) * min_df_num)


def strip_boilerplate(
    docs: DataFrame,
    min_df_num: int = 1,
    min_df_den: int = 2,
    id_col: str = "url",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """Strip high-df leading/trailing lines from every document.

    Returns the input ids with::

        (id, text_stripped, n_lines, n_stripped_leading, n_stripped_trailing)

    * interior boilerplate lines are KEPT (crop semantics: only edges);
    * a document made entirely of boilerplate strips to the empty string
      (the reference's analog: a frame that is all letterbox crops to
      nothing and errors downstream as NotEnoughFrames — here the signature
      stage will mark it ``NotEnoughTokens``);
    * documents with null text pass through with null output and zero
      counts.
    """
    from pyspark.sql.window import Window

    lines = _doc_lines(docs, id_col, text_col)
    bp = boilerplate_lines(
        docs, min_df_num, min_df_den, id_col, text_col, n_docs
    ).select("line", F.lit(True).alias("_bp"))

    flagged = lines.join(bp, "line", "left").select(
        "id", "pos", "line", F.coalesce("_bp", F.lit(False)).alias("is_bp")
    )
    # the A1 crop-union fold (Crop::union, crop.rs:53-68): per-side min/max
    # over the member "frames" (lines) yields the retained window.  Window
    # functions instead of an agg + self-join: the per-round plan audit
    # showed the join form re-deriving the whole lines/df subtree per branch
    # — with windows + conditional collect_list the corpus is scanned once
    # for the line stream and once for the df table, nothing more.
    w = Window.partitionBy("id")
    keep_w = F.when(~F.col("is_bp"), F.col("pos"))
    ann = flagged.select(
        "id",
        "pos",
        "line",
        F.count("*").over(w).alias("n_lines"),
        F.min(keep_w).over(w).alias("first_keep"),
        F.max(keep_w).over(w).alias("last_keep"),
    )
    # collect_list skips nulls: out-of-window lines vanish inside ONE groupBy;
    # all-boilerplate docs (first_keep null) keep their row with an empty list
    out = ann.groupBy("id", "n_lines", "first_keep", "last_keep").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("pos").between(
                                F.col("first_keep"), F.col("last_keep")
                            ),
                            F.struct("pos", "line"),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_stripped")
    )
    out = out.select(
        "id",
        "text_stripped",
        "n_lines",
        F.coalesce(F.col("first_keep").cast("long"), F.col("n_lines")).alias(
            "n_stripped_leading"
        ),
        F.when(F.col("first_keep").isNull(), F.lit(0).cast("long"))
        .otherwise((F.col("n_lines") - 1 - F.col("last_keep")).cast("long"))
        .alias("n_stripped_trailing"),
    )
    # null-text docs have no lines at all — restore them from the id spine
    null_docs = (
        docs.where(F.col(text_col).isNull())
        .select(
            F.col(id_col).alias("id"),
            F.lit(None).cast("string").alias("text_stripped"),
            F.lit(0).cast("long").alias("n_lines"),
            F.lit(0).cast("long").alias("n_stripped_leading"),
            F.lit(0).cast("long").alias("n_stripped_trailing"),
        )
    )
    return out.unionByName(null_docs)


class FrequentLineSetTooLarge(ValueError):
    """The corpus-frequent line set exceeds the broadcast valve."""


def strip_frequent_lines(
    lined: DataFrame,
    min_df: int = 3,
    max_frequent_lines: int = 5_000_000,
    id_col: str = "doc_id",
    lines_col: str = "lines",
) -> DataFrame:
    """Corpus-level frequent-line removal — the CCNet-style complement of
    :func:`strip_boilerplate` (Wenzek et al. 2019 drop duplicated
    *paragraphs* corpus-wide; public knowledge).  Where ``strip_boilerplate``
    crops only document *edges* against a fractional-df threshold (the
    letterbox semantics of the reference, ``video_frames_gray.rs:201-210``),
    this strips lines ANYWHERE in the document whose corpus document
    frequency reaches the absolute ``min_df`` — the shared-nav-bar /
    cookie-banner signal that survives in the middle of extracted web text.

    Input: ``(id, lines: array<string>)`` (e.g. ``textstats.token_lines``
    re-lining).  Output per input row::

        (id, n_lines, n_kept, kept_md5)

    where ``kept_md5`` is the md5 of the surviving lines joined by ``\\n``
    in original order (the downstream exact-dedup key), so the *content* of
    the strip is oracle-checkable, not just the counts.

    Scale shape (100 TB):

    * document frequency is computed skew-safe in two hops — a distinct on
      ``(line, id)`` first (spreads a line shared by 10^9 docs across
      reducers) then a map-side-combinable count per line;
    * the frequent set (df >= min_df) is tiny relative to the corpus and is
      BROADCAST into a left-anti hash join — the full line stream never
      shuffles for the strip itself.  ``max_frequent_lines`` is the
      fail-fast valve on that broadcast (counted on the driver as a scalar,
      never collected): an unexpectedly generic threshold raises
      :class:`FrequentLineSetTooLarge` with the measured count instead of
      OOMing executors;
    * reassembly groups on the doc id — the same key the signature stage
      consumes next.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2 (got {min_df}): df=1 strips every line")
    spine = lined.select(
        F.col(id_col).alias("id"), F.size(lines_col).cast("long").alias("n_lines")
    )
    exploded = lined.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(lines_col)).alias("pos", "line"),
    )
    frequent = (
        exploded.select("line", "id")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= F.lit(min_df))
        .select("line")
    )
    n_frequent = frequent.count()
    if n_frequent > max_frequent_lines:
        raise FrequentLineSetTooLarge(
            f"{n_frequent} corpus-frequent lines at min_df={min_df} exceeds the "
            f"broadcast valve ({max_frequent_lines}); raise min_df or the valve"
        )
    kept = (
        exploded.join(F.broadcast(frequent), "line", "left_anti")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                )
            ).alias("kept_md5"),
        )
    )
    # docs whose every line was frequent (or that had no lines) fall out of
    # the anti-join — restore them from the spine with the empty-text hash
    return spine.join(kept, "id", "left").select(
        F.col("id").alias(id_col),
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
    )


def dedup_lines_first_wins(
    lined: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    emit_text: bool = False,
) -> DataFrame:
    """Corpus-global exact paragraph/line dedup, first-occurrence-wins —
    the RefinedWeb / "exact substring dedup at paragraph granularity"
    semantics (Penedo et al. 2023; public knowledge): every line occurrence
    that is NOT the globally first occurrence of that exact line is dropped,
    where "first" is the total order ``(id, pos)`` — lowest doc id wins,
    then earliest position within the doc (so a doc repeating its own line
    keeps only the first copy).  Contrast with :func:`strip_frequent_lines`,
    which drops ALL copies of over-frequent lines including the first.

    Input: ``(id, lines: array<string>)``.  Output per input row::

        (id, n_lines, n_kept, kept_md5)

    with ``kept_md5`` = md5 of the surviving lines joined by ``\\n`` in
    original order (the downstream exact-dedup key), matching the
    :func:`strip_frequent_lines` contract so the two strips compose.
    ``emit_text=True`` additionally materializes ``text_kept`` (the
    surviving lines joined by a space, the hash's preimage re-joined for
    downstream tokenization) for pipeline-stage use, where the rewritten
    document feeds the signature kernel.

    Scale shape (100 TB): the whole operator is ONE map-side-combinable
    aggregation plus one regroup — no join anywhere.  The kept set is
    exactly ``min(struct(id, pos))`` per distinct line: partial ``min`` s
    combine on the map side, so a line duplicated across 10^9 documents
    ships ONE candidate row per map task to its reducer (the skew a
    window-function formulation would concentrate instead).  The second
    aggregation regroups the (already deduplicated, hence no larger than
    the corpus' distinct-line count) winners by doc id — the same key the
    signature stage consumes next.
    """
    spine = lined.select(
        F.col(id_col).alias("id"), F.size(lines_col).cast("long").alias("n_lines")
    )
    exploded = lined.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(lines_col)).alias("pos", "line"),
    )
    winners = exploded.groupBy("line").agg(
        F.min(F.struct("id", "pos")).alias("first")
    )
    kept = (
        winners.select(
            F.col("first.id").alias("id"),
            F.col("first.pos").alias("pos"),
            "line",
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                )
            ).alias("kept_md5"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("text_kept"),
        )
    )
    out = spine.join(kept, "id", "left").select(
        F.col("id").alias(id_col),
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        F.coalesce("text_kept", F.lit("")).alias("text_kept"),
    )
    return out if emit_text else out.drop("text_kept")


def frequent_line_topk(
    lined: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    lines_col: str = "lines",
) -> DataFrame:
    """The audit view of :func:`strip_frequent_lines`: the corpus' top-k
    most-frequent lines with their document frequency and rank — what an
    operator reviews to pick ``min_df`` BEFORE turning the strip on (and
    the report a pipeline run attaches to its lineage so "what got
    stripped" is never invisible).

    Output: ``(rank, line, df)``, rank 1-based under the deterministic
    total order (df descending, then line ascending).

    Scale shape: distinct-by-doc df in the same two skew-safe hops as the
    strip, then a global top-k — Spark plans ``orderBy().limit(k)`` as
    TakeOrderedAndProject (per-partition heaps, a k-row driver merge),
    never a full sort.  Rank is assigned WITHOUT a global window (the repo
    rule): a broadcast self-join over the <= k surviving rows counts the
    rows sorting strictly before each one.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = (
        lined.select(
            F.col(id_col).alias("id"),
            F.explode(F.col(lines_col)).alias("line"),
        )
        .select("line", "id")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    # <= k rows, but BOTH sides of the rank self-join read it: materialize
    # or the full df aggregation + top-k runs twice
    top = df.orderBy(F.desc("df"), F.asc("line")).limit(k).localCheckpoint(
        eager=True
    )
    o = top.select(F.col("line").alias("o_line"), F.col("df").alias("o_df"))
    before = (F.col("o_df") > F.col("df")) | (
        (F.col("o_df") == F.col("df")) & (F.col("o_line") < F.col("line"))
    )
    return (
        top.join(F.broadcast(o), before, "left")
        .groupBy("line", "df")
        .agg((F.count("o_line") + 1).cast("long").alias("rank"))
        .select("rank", "line", "df")
    )
