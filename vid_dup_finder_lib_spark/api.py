"""Top-level search API — the analog of the reference library's public
entry points (``vid_dup_finder_lib/src/lib.rs:133`` ``search`` and
``video_dup_finder.rs:19-46`` ``search_with_references``).

The plan each call builds (declaratively; Catalyst chooses physical ops):

    docs -> signatures (Arrow UDF stage, no shuffle)
         -> LSH band explode + self-join (shuffle on band key)
         -> exact verify (shuffle on id for the two signature joins)
         -> edges -> iterative CC -> groups

``tolerance`` has the reference's exact meaning: integer radius
``floor(t * 1000)`` on the token-Hamming distance (definitions.rs:40).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import DEFAULT_CONFIG, SigConfig
from vid_dup_finder_lib_spark.operators.grouping import cc_groups, matchset_groups
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs, band_keys
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.operators.verify import (
    attach_signatures,
    ref_length_band,
    self_length_band,
    tolerance_predicate,
    verified_edges,
    with_distances,
)


def _materialize(df: DataFrame, enabled: bool) -> DataFrame:
    """Stage-boundary materialization.

    Every stage output is consumed by more than one downstream operator
    (LSH keys feed both bucket-size stats and the self-join; edges feed CC
    and the greedy pass), so without a cut Spark re-executes the Arrow UDF
    pipeline once per consumer.  ``localCheckpoint`` is the in-session form;
    plans/checkpoint.py persists the same boundaries to tables for resumable
    runs (the reference's save-every-2000 cache analog, base_fs_cache.rs).
    """
    return df.localCheckpoint(eager=True) if enabled else df


def resolve_signature_unit(
    docs: DataFrame, text_col: str = "text", sample_mod: int = 64
) -> str:
    """Corpus probe behind ``unit="auto"``: char granularity iff the
    majority of (sampled) docs are space-free.

    Deterministic and partitioning-invariant: the sample keys on
    ``xxhash64(text) % sample_mod == 0`` — content, not row placement.
    Known, accepted bias (ADVICE r5): because the key is the CONTENT,
    all copies of an identical document sample all-or-nothing, so on
    duplicate-heavy corpora a hot page votes with its full multiplicity
    or not at all.  That is deliberate here: the probe must give one
    answer for one corpus regardless of row ids/ordering (id-keyed
    sampling would let two loads of the same corpus with different
    surrogate ids disagree), and the space-free vote is a coarse
    majority where the occasional multiplicity skew does not flip
    corpora that aren't already near the boundary.  The vote itself is
    the integer space-free rule from
    :func:`functions.textstats.script_profile_components` (fewer than one
    space per 20 chars; empty docs never vote char).  If the sample
    catches zero docs (corpus smaller than ~``sample_mod``), the probe
    falls back to scanning every doc — tiny corpora cost nothing anyway.

    Scale shape: one projected scan of ~1/64 of the text column folding
    into a single two-long aggregate — the price of a config decision,
    paid once before any signature work.  The checkpointed pipeline and
    the persistent stores do NOT accept "auto": their fingerprints must
    record the unit explicitly (a probe re-run over a GROWN corpus could
    flip the answer and silently mix granularities; the store refuses
    unit flips by fingerprint instead).
    """
    from vid_dup_finder_lib_spark.functions.textstats import (
        script_profile_components,
    )

    flag = script_profile_components(F.col(text_col))["space_free"]
    sampled = docs.where(
        F.pmod(F.xxhash64(F.coalesce(F.col(text_col), F.lit(""))), sample_mod) == 0
    )
    row = sampled.select(
        F.count(F.lit(1)).alias("n"), F.sum(flag).alias("sf")
    ).collect()[0]
    if row["n"] == 0:
        row = docs.select(
            F.count(F.lit(1)).alias("n"), F.sum(flag).alias("sf")
        ).collect()[0]
    if row["n"] == 0:
        return "token"
    return "char" if 2 * row["sf"] > row["n"] else "token"


def _resolve_unit(docs: DataFrame, text_col: str, unit: str) -> str:
    return resolve_signature_unit(docs, text_col) if unit == "auto" else unit


def find_edges(
    docs: DataFrame,
    tolerance: float,
    cfg: SigConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    signatures: DataFrame | None = None,
    materialize: bool = True,
    unit: str = "token",
) -> DataFrame:
    """All verified near-dup pairs at the tolerance (the M2 minimum slice).

    ``unit="char"`` switches the whole chain to character granularity
    (build_signatures' unsegmented-script mode) — tolerance radius and
    length band then operate on character counts, the right domain for
    spaceless zh/ja/th text.  ``unit="auto"`` probes the corpus first
    (:func:`resolve_signature_unit`) and picks char iff the majority of
    sampled docs are space-free."""
    if signatures is not None:
        # precomputed signatures already fix the granularity: the auto
        # probe's one-or-two corpus scans would be paid and then discarded
        if unit == "auto":
            raise ValueError(
                "find_edges: unit='auto' cannot be combined with precomputed "
                "signatures — the signature table already fixes the unit; "
                "pass the unit it was built with (or omit signatures)"
            )
        sigs = signatures
    else:
        unit = _resolve_unit(docs, text_col, unit)
        sigs = build_signatures(docs, cfg, id_col, text_col, unit=unit)
    sigs = _materialize(sigs, materialize and signatures is None)
    pairs, _quarantined = candidate_pairs(sigs, cfg)
    pairs = _materialize(pairs, materialize)
    return _materialize(verified_edges(pairs, sigs, cfg, tolerance=tolerance), materialize)


def search(
    docs: DataFrame,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    grouping: str = "matchset",
    id_col: str = "url",
    text_col: str = "text",
    strip_boilerplate: bool = False,
    boilerplate_min_df: tuple[int, int] = (1, 2),
    unit: str = "token",
) -> DataFrame:
    """Self-search: groups of near-duplicates.

    grouping="matchset" replays the reference's greedy consume exactly;
    grouping="cc" returns connected components (scalable default for web
    dedup, and identical output in the reference's own test regimes).
    Returns (cluster_id, id [, is_seed]).

    ``strip_boilerplate`` runs the optional pre-signature letterbox-crop
    analog (operators/boilerplate.py) — off by default, matching the
    reference CLI's ``Cropdetect::None`` default (arg_parse.rs:543-547).

    ``unit``: ``"token"`` | ``"char"`` | ``"auto"`` as in
    :func:`find_edges`; with ``strip_boilerplate`` the auto probe runs
    over the STRIPPED text (the stream the signatures see).
    """
    tol = cfg.default_tolerance if tolerance is None else tolerance
    if strip_boilerplate:
        from vid_dup_finder_lib_spark.operators import boilerplate as bp

        num, den = boilerplate_min_df
        docs = bp.strip_boilerplate(
            docs, num, den, id_col=id_col, text_col=text_col
        ).select(
            F.col("id").alias(id_col), F.col("text_stripped").alias(text_col)
        )
        docs = _materialize(docs, True)
    edges = find_edges(docs, tol, cfg, id_col, text_col, unit=unit)
    if grouping == "cc":
        return cc_groups(edges)
    if grouping == "matchset":
        return matchset_groups(edges)
    raise ValueError(f"unknown grouping mode {grouping!r}")


def search_with_references(
    ref_docs: DataFrame,
    cand_docs: DataFrame,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    unit: str = "token",
) -> DataFrame:
    """Refs-vs-cands search (J3): for each reference doc, every candidate
    within tolerance and the ±5 % length band.  No consume — a candidate may
    appear under many refs (video_dup_finder.rs:28-29).  The ref side is
    broadcast when small (Spark's planner decides via AQE since the band join
    is an equi-join).

    Returns (ref_id, cand_id, token_hamming).

    ``unit`` as in :func:`find_edges`; both sides MUST share one
    granularity (the signatures are joined), so ``"auto"`` probes the
    CANDIDATE corpus (the big side — the refs follow its script).
    """
    tol = cfg.default_tolerance if tolerance is None else tolerance
    unit = _resolve_unit(cand_docs, text_col, unit)
    # both signature tables feed two consumers each (band keys + the verify
    # attach join): materialize or the Arrow stage re-executes per consumer
    ref_sigs = _materialize(
        build_signatures(ref_docs, cfg, id_col, text_col, unit=unit), True
    )
    cand_sigs = _materialize(
        build_signatures(cand_docs, cfg, id_col, text_col, unit=unit), True
    )
    return refs_edges_from_signatures(ref_sigs, cand_sigs, tol, cfg)


def refs_edges_from_signatures(
    ref_sigs: DataFrame,
    cand_sigs: DataFrame,
    tolerance: float,
    cfg: SigConfig = DEFAULT_CONFIG,
    length_band: str = "ref",
) -> DataFrame:
    """:func:`search_with_references` over ALREADY-BUILT signature tables —
    the entry point for callers that persist signatures (the incremental
    plan, the signature store, streaming ingest) and must not pay the Arrow
    kernel again.  Both inputs must be :func:`build_signatures` output (or
    a store read of it); both feed two consumers here, so materialize them
    first if they have a recompute upstream.

    ``length_band`` selects which duration-window rule gates the pairs:

    * ``"ref"`` (default) — the reference's ref-centric ±5 % window
      (search_algorithm.rs:173-185), the J3 refs-search semantics;
    * ``"self"`` — the symmetric 1.10-ratio self-search window
      (search_algorithm.rs:93-116).  REQUIRED when the caller's contract
      is parity with a from-scratch self-search over the union corpus
      (``search_incremental``, streaming near-dup ingest): the two
      windows differ on length ratios in (1.05, 1.10], so the ref window
      silently drops edges the self-search would keep.

    Returns (ref_id, cand_id, token_hamming).
    """
    if length_band not in ("ref", "self"):
        raise ValueError(f"length_band must be 'ref' or 'self', got {length_band!r}")
    rk = band_keys(ref_sigs, cfg).select("band_id", "band_hash", F.col("id").alias("id1"))
    ck = band_keys(cand_sigs, cfg).select("band_id", "band_hash", F.col("id").alias("id2"))
    pairs = rk.join(ck, ["band_id", "band_hash"]).select("id1", "id2").distinct()

    # attach both sides' signatures (ref as id1, cand as id2) with manual
    # column pruning: the predicate below is token_hamming + length band
    # only, so the wide shingle arrays are never shipped through the verify
    # shuffle (need_shingles=False — same pruning as the self-search path)
    both = with_distances(
        attach_signatures(
            pairs, ref_sigs, need_shingles=False, need_tokens=True,
            signatures2=cand_sigs,
        )
    )
    band = (
        ref_length_band(cfg, F.col("len1"), F.col("len2"))
        if length_band == "ref"
        else self_length_band(cfg)
    )
    matched = both.where(
        band
        & tolerance_predicate(cfg, tolerance)
        & (F.col("id1") != F.col("id2"))
    )
    return matched.select(
        F.col("id1").alias("ref_id"), F.col("id2").alias("cand_id"), "token_hamming"
    )


def search_incremental(
    new_docs: DataFrame,
    sigstore,
    prev_assignment: DataFrame,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    update_store: bool = True,
    unit: str = "token",
) -> DataFrame:
    """ADDITIVE incremental self-search: fold a batch of brand-new docs
    into an existing clustering without recomputing the old corpus.

    ``unit`` must match the granularity the STORE was built with (the
    signature columns are structurally identical across units, so a flip
    would silently verify char minhashes against token minhashes) — the
    persistent-store fingerprint carries ``signature_unit`` exactly so a
    mismatched fold fails fast at ``sigstore.read``.  ``search_delete``
    and ``search_merge*`` take no unit: they only re-search STORED
    signatures, which already carry their granularity.

    The batch form of the reference's cache-then-rerun workflow
    (app_fns.rs: rebuild hashes incrementally, re-search everything) with
    the re-search made O(new): the new batch is signature-hashed once,
    LSH-searched against ITSELF (candidate_pairs) and against the FULL
    persisted signature store (refs_edges_from_signatures — every old doc,
    not just survivors, so transitive closure is exact), and the resulting
    edges are merged into ``prev_assignment`` via
    ``components.incremental_components`` (star-contraction identity: the
    result is provably the from-scratch clustering of the union corpus).
    The store is then grown by the new signatures (O(delta) bucket
    rewrite).

    Returns the updated ``(id, component)`` assignment over every
    previously-assigned node and every new doc that matched anything; the
    caller joins back to the corpus for singletons, exactly as with
    ``connected_components``.  Contrast with
    ``streaming.neardup.stream_neardup_dedup``: that path keeps a
    SURVIVOR-only store (greedy arrival-order canonicals, radius
    semantics); this one keeps everything and preserves exact transitive
    closure.

    Constraint (documented, enforced nowhere cheaper than here): the batch
    must be NEW ids only.  Changed or deleted docs can SPLIT components,
    which no star-merge can express — callers with mutations run the full
    pipeline (whose signature stage is already O(delta)).  Ids that
    already exist in the store raise.
    """
    from vid_dup_finder_lib_spark.operators.components import (
        incremental_components,
    )

    spark = new_docs.sparkSession
    tol = cfg.default_tolerance if tolerance is None else tolerance
    sigs_new = _materialize(
        build_signatures(new_docs, cfg, id_col, text_col, unit=unit), True
    )
    old_sigs = sigstore.read(spark)
    n_overlap = sigs_new.select("id").join(
        old_sigs.select("id"), "id", "left_semi"
    ).count()
    if n_overlap:
        raise ValueError(
            f"search_incremental is additive-only: {n_overlap} batch ids "
            "already exist in the signature store — changed/deleted docs can "
            "split components; run the full pipeline for mutations"
        )
    pairs, _q = candidate_pairs(sigs_new, cfg)
    edges_nn = verified_edges(pairs, sigs_new, cfg, tolerance=tol).select(
        "id1", "id2"
    )
    edges_no = refs_edges_from_signatures(
        old_sigs, sigs_new, tol, cfg, length_band="self"
    ).select(
        F.col("ref_id").alias("id1"), F.col("cand_id").alias("id2")
    )
    assignment = incremental_components(
        prev_assignment, _materialize(edges_nn.unionByName(edges_no), True)
    )
    if update_store:
        up = sigs_new
        if "cached_ts" in old_sigs.columns:
            # pipeline-written stores carry the refresh-diff timestamp
            # (operators/incremental.refresh_signatures): attach the batch's
            # so the NEXT full pipeline run diffs correctly against it
            up = up.join(
                new_docs.select(
                    F.col(id_col).alias("id"), F.col(ts_col).alias("cached_ts")
                ),
                "id",
            )
        sigstore.upsert(up)
    return assignment


def search_delete(
    delete_ids: DataFrame,
    sigstore,
    prev_assignment: DataFrame,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    keep_isolated: bool = True,
    update_store: bool = True,
) -> DataFrame:
    """DELETION fold: remove docs (takedowns, robots.txt revocations,
    right-to-be-forgotten requests) from an existing clustering with
    O(affected) recompute — the dual of ``search_incremental``, and the
    batch form of the reference's vanished-file handling (its workflow
    drops match-DB entries whose files disappeared and regroups everything,
    match_db.rs; here only components that LOST a member are re-solved).

    Exactness argument (see ``components.delete_components``): the previous
    assignment is the transitive closure over ALL verified edges at this
    config, so every verified edge is intra-component — deleting docs only
    removes edges, never creates cross-component ones.  Re-searching the
    surviving members of affected components is therefore provably equal to
    a from-scratch search over the remaining corpus (test-pinned, including
    bridge-doc splits and min-label deletions).

    Quarantine caveat: that argument assumes the original run VERIFIED
    every candidate pair.  Under a quarantine regime (hot LSH buckets
    sampled/quarantined, operators/lsh.py), re-searching only the affected
    subset shrinks those buckets, so a pair the original run quarantined
    could now verify and bridge two previously-distinct components —
    deletion would then *merge*.  The re-search edges are therefore
    filtered to pairs that shared a previous component, which restores the
    never-merges invariant structurally; the price is that a
    quarantine-lost edge stays lost until the next full run (the same
    contract ``search_merge_many`` documents for its identity-merge path).

    Scale shape: the affected survivor set is O(deleted · cluster size);
    its signatures come from a BUCKET-PRUNED store read
    (``sigstore.read_for_ids`` — only the partitions those ids hash into
    are scanned), the re-search LSH-joins only that subset, and the store
    delete is an O(delta) bucket rewrite.  Nothing touches the unaffected
    corpus.

    Requires the same ``tolerance``/``cfg`` the assignment was built with
    (a different radius would change edges everywhere, not just near the
    deleted docs) and a FULL signature store (every old doc, as
    ``search_incremental`` maintains — not the streaming path's
    survivor-only store, whose radius semantics lose transitivity).

    Returns the updated ``(id, component)`` assignment: unaffected rows
    pass through label-stable; affected survivors are re-clustered (now-
    isolated ones kept as ``(id, id)`` rows when ``keep_isolated``).  Ids
    not present anywhere are no-ops.
    """
    from vid_dup_finder_lib_spark.operators.components import delete_components

    tol = cfg.default_tolerance if tolerance is None else tolerance
    dels = (
        delete_ids.select(F.col(delete_ids.columns[0]).alias("id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = prev_assignment.select("id", "component")
    affected = (
        prev.join(dels, "id", "left_semi").select("component").distinct()
    )
    surv_assign = (
        prev.join(affected, "component", "left_semi")
        .join(dels, "id", "left_anti")
        .localCheckpoint(eager=True)
    )  # (id, component) — O(affected), small
    survivors = surv_assign.select("id")
    sigs_sub = _materialize(sigstore.read_for_ids(survivors), True)
    # fail fast on an inconsistent store: a survivor with no stored
    # signature would silently lose all its edges and drop out of its
    # cluster — the store must cover every assigned doc (search_incremental
    # maintains that invariant; a survivor-only streaming store does not)
    n_surv, n_sigs = survivors.count(), sigs_sub.count()
    if n_sigs < n_surv:
        raise ValueError(
            f"signature store is missing {n_surv - n_sigs} of {n_surv} "
            "surviving members of affected components — search_delete "
            "requires a FULL store (every assigned doc), not a "
            "survivor-only one; re-run the full pipeline instead"
        )
    pairs, _q = candidate_pairs(sigs_sub, cfg)
    edges = verified_edges(pairs, sigs_sub, cfg, tolerance=tol).select(
        "id1", "id2"
    )
    # quarantine guard (docstring): keep only edges whose ends shared a
    # previous component, so a subset-re-search edge the original run
    # quarantined can never MERGE two previously-distinct components
    edges = (
        edges.join(
            F.broadcast(
                surv_assign.select(
                    F.col("id").alias("id1"), F.col("component").alias("__c1")
                )
            ),
            "id1",
        )
        .join(
            F.broadcast(
                surv_assign.select(
                    F.col("id").alias("id2"), F.col("component").alias("__c2")
                )
            ),
            "id2",
        )
        .where(F.col("__c1") == F.col("__c2"))
        .select("id1", "id2")
    )
    assignment = delete_components(
        prev, dels, edges, keep_isolated=keep_isolated
    )
    if update_store:
        sigstore.delete(dels)
    return assignment


def search_merge(
    sigstore_a,
    prev_a: DataFrame,
    sigstore_b,
    prev_b: DataFrame,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    update_store: bool = True,
) -> DataFrame:
    """Merge two INDEPENDENTLY-clustered corpora with disjoint ids (two
    monthly crawls, two shards of a sharded build) into one clustering
    without re-searching within either side — the hierarchical composition
    the reference cannot express (it regroups one monolithic match DB per
    run, match_db.rs).

    Only the CROSS edges A×B are computed (LSH band join between the two
    persisted signature stores, ``length_band='self'`` so the pair window
    matches from-scratch self-search), then both assignments — each
    already a star forest with its side's connectivity — are merged with
    the cross edges by the star-contraction identity:
    ``CC(star(G_A) ∪ star(G_B) ∪ E_AB) == CC(G_A ∪ G_B ∪ E_AB)``.
    Provably equal to a from-scratch search over the union corpus
    (test-pinned, including clusters spanning the split); enables a
    shard-then-merge corpus build where each shard clusters in isolation
    and merges pairwise, paying O(|A|·|B| band collisions) per merge
    instead of O((|A|+|B|)²) re-search.

    Ids must be disjoint (overlaps raise: the same id on both sides means
    the corpora are not independent shards — run the full pipeline).
    ``update_store`` grows store A by store B's rows (O(|B|) bucket
    rewrite); the returned assignment covers every node of both previous
    assignments plus any doc in a cross edge.
    """
    from vid_dup_finder_lib_spark.operators.components import (
        incremental_components,
    )

    tol = cfg.default_tolerance if tolerance is None else tolerance
    spark = prev_a.sparkSession
    sigs_a = _materialize(sigstore_a.read(spark), True)
    sigs_b = _materialize(sigstore_b.read(spark), True)
    n_overlap = sigs_a.select("id").join(
        sigs_b.select("id"), "id", "left_semi"
    ).count()
    if n_overlap:
        raise ValueError(
            f"search_merge requires disjoint corpora: {n_overlap} ids "
            "appear in both signature stores — shards sharing docs are "
            "not independent; run the full pipeline over the union"
        )
    cross = refs_edges_from_signatures(
        sigs_a, sigs_b, tol, cfg, length_band="self"
    ).select(F.col("ref_id").alias("id1"), F.col("cand_id").alias("id2"))
    prev = prev_a.select("id", "component").unionByName(
        prev_b.select("id", "component")
    )
    assignment = incremental_components(prev, _materialize(cross, True))
    if update_store:
        sigstore_a.upsert(sigs_b.select(*sigs_a.columns))
    return assignment


def search_merge_many(
    shards,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    update_store: bool = True,
) -> DataFrame:
    """K-way generalization of :func:`search_merge`: merge K independently-
    clustered corpora with pairwise-disjoint ids in ONE job instead of K-1
    sequential pairwise merges.

    The union of all K signature tables goes through the SAME skew-managed
    LSH candidate machinery as a from-scratch self-search
    (``candidate_pairs``: plain / salted-triangle / quarantine tiers), but
    intra-shard pairs are dropped BEFORE the expensive verify attach — each
    shard's internal connectivity is already present in its previous
    assignment (a star forest), so only cross-shard pairs need signature
    arrays shuffled to them.  One ``incremental_components`` pass over the
    union of all K star forests plus the verified cross edges then yields
    the merged clustering (star-contraction identity, applied K-fold).

    Equal to a from-scratch search over the union corpus whenever no LSH
    bucket crosses the quarantine cap; in quarantine regimes the merged
    result is a recall SUPERSET of the monolithic run (shard-local buckets
    are smaller, so shard runs keep pairs a union-scale bucket would
    quarantine) — the desirable direction for dedup.

    ``shards``: sequence of ``(sigstore, prev_assignment)``; ids must be
    disjoint across ALL shards (checked in one aggregation — a shared id
    means the corpora are not independent shards).  ``update_store`` grows
    shard 0's store by every other shard's rows in a single O(sum |B_i|)
    upsert.
    """
    from functools import reduce

    from vid_dup_finder_lib_spark.operators.components import (
        incremental_components,
    )

    shards = list(shards)
    if len(shards) < 2:
        raise ValueError("search_merge_many needs at least 2 shards")
    tol = cfg.default_tolerance if tolerance is None else tolerance
    spark = shards[0][1].sparkSession
    sigs = [_materialize(store.read(spark), True) for store, _ in shards]
    tagged = reduce(
        DataFrame.unionByName,
        [s.withColumn("_shard", F.lit(i)) for i, s in enumerate(sigs)],
    )
    n_overlap = tagged.groupBy("id").count().where(F.col("count") > 1).count()
    if n_overlap:
        raise ValueError(
            f"search_merge_many requires pairwise-disjoint corpora: "
            f"{n_overlap} ids appear in more than one signature store — "
            "shards sharing docs are not independent; run the full "
            "pipeline over the union"
        )
    tagged = _materialize(tagged, True)  # feeds band keys + verify attach
    union_sigs = tagged.drop("_shard")
    pairs, _quarantined = candidate_pairs(union_sigs, cfg)
    tags = tagged.select("id", "_shard")
    cross = (
        pairs.join(
            tags.select(F.col("id").alias("id1"), F.col("_shard").alias("_s1")),
            "id1",
        )
        .join(
            tags.select(F.col("id").alias("id2"), F.col("_shard").alias("_s2")),
            "id2",
        )
        .where(F.col("_s1") != F.col("_s2"))
        .select("id1", "id2")
    )
    edges = verified_edges(cross, union_sigs, cfg, tolerance=tol)
    prev = reduce(
        DataFrame.unionByName,
        [p.select("id", "component") for _, p in shards],
    )
    assignment = incremental_components(
        prev, _materialize(edges.select("id1", "id2"), True)
    )
    if update_store:
        store0 = shards[0][0]
        others = reduce(DataFrame.unionByName, sigs[1:])
        store0.upsert(others.select(*sigs[0].columns))
    return assignment


def explain_pair(
    docs: DataFrame,
    pairs: DataFrame,
    cfg: SigConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    lcs_k: int = 8,
    line_tokens: int = 8,
) -> DataFrame:
    """One-stop pair diagnostic — the library analog of the reference GUI's
    side-by-side inspection (vid_dup_finder_app gui: a human reviews WHAT
    matched before confirming): for each requested (id1, id2), every
    similarity the engine can compute, in one row::

        (id1, id2, inter_count, union_count, token_hamming, simhash_hamming,
         lcs_tokens, lcs_start1, lcs_start2,
         n_tokens1, n_tokens2, covered1, covered2,
         coverage1_ppm, coverage2_ppm,
         n_lines1, n_lines2, n_shared, n_only1, n_only2)

    Intended for REVIEW-sized pair lists (confirm/falsepos queues, spot
    checks), not corpus-wide joins: the corpus is first semi-join-pruned to
    the docs the pairs reference, so cost scales with the pair list, never
    the corpus.  For corpus-wide analytics use the per-family operators
    directly (verified_edges + with_distances, pair_token_lcs,
    pair_verbatim_coverage, pair_line_diff).
    """
    from vid_dup_finder_lib_spark.functions.text import normalize_text, tokens_col
    from vid_dup_finder_lib_spark.functions.textstats import token_lines
    from vid_dup_finder_lib_spark.operators.substring import (
        pair_token_lcs,
        pair_verbatim_coverage,
    )
    from vid_dup_finder_lib_spark.operators.verify import pair_line_diff

    p = pairs.select(
        F.col("id1").cast("string").alias("id1"),
        F.col("id2").cast("string").alias("id2"),
    ).distinct()
    ids = (
        p.select(F.col("id1").alias("__id"))
        .unionByName(p.select(F.col("id2").alias("__id")))
        .distinct()
    )
    sub = docs.join(
        ids, docs[id_col].cast("string") == ids["__id"], "left_semi"
    ).select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    ).localCheckpoint(eager=True)

    sigs = build_signatures(sub, cfg, id_col="id", text_col="text").localCheckpoint(
        eager=True
    )
    dist = with_distances(
        attach_signatures(p, sigs, need_shingles=True, need_tokens=True)
    ).select(
        "id1", "id2", "inter_count", "union_count", "token_hamming", "simhash_hamming"
    )

    toks = sub.select(
        "id", tokens_col(normalize_text(F.col("text"))).alias("toks")
    )
    # LCS and coverage share the expensive diagonal-runs core (positional
    # gram explode + match join + island window): compute it ONCE,
    # materialize, and feed both — not twice (ROUND4 gap #5)
    from vid_dup_finder_lib_spark.operators.substring import _diagonal_runs

    runs = _diagonal_runs(
        p, toks, lcs_k, "id", "toks", "id1", "id2",
        max_gram_repeat=1_000, caller="explain_pair",
    ).localCheckpoint(eager=True)
    lcs = pair_token_lcs(
        p, toks, k=lcs_k, id_col="id", toks_col="toks", runs=runs
    ).select(
        "id1", "id2", "lcs_tokens",
        F.col("start1").alias("lcs_start1"), F.col("start2").alias("lcs_start2"),
    )
    cov = pair_verbatim_coverage(
        p, toks, k=lcs_k, id_col="id", toks_col="toks", runs=runs
    )
    lined = sub.select("id", token_lines(F.col("text"), line_tokens).alias("lines"))
    ldiff = pair_line_diff(p, lined, id_col="id")

    return (
        dist.join(lcs, ["id1", "id2"])
        .join(cov, ["id1", "id2"])
        .join(ldiff.select("id1", "id2", "n_lines1", "n_lines2",
                           "n_shared", "n_only1", "n_only2"),
              ["id1", "id2"])
    )


def dedup_corpus(
    docs: DataFrame,
    tolerance: float | None = None,
    cfg: SigConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    survivor_rule: str = "min_id",
    unit: str = "token",
    score_col: str | None = None,
) -> DataFrame:
    """The one-call fuzzy dedup a training pipeline wants: search, cluster,
    pick one survivor per cluster, return the KEPT documents (all input
    columns, plus ``cluster_size`` lineage — 1 for docs that matched
    nothing).  The CLI form is ``--emit-corpus``; this is the library form.

    ``survivor_rule``:

    * ``"min_id"`` — smallest member id (deterministic, arbitrary; matches
      the CC label, so survivors ARE the cluster ids);
    * ``"medoid"`` — the most-central member by summed incident edge
      Jaccard mass (operators.dedup.medoid_survivors): the defensible rule
      when the kept text is the product;
    * ``"quality"`` — the highest-scoring member
      (operators.dedup.priority_survivors): keep the best-quality crawl of
      the page.  ``score_col`` names an integer score column on ``docs``
      (e.g. precomputed from functions.textstats.quality_score_components);
      when None the score defaults to the character length of ``text_col``
      — the longest-extraction rule.  Ties break to the minimum id.

    ``unit``: ``"token"`` | ``"char"`` | ``"auto"`` as in
    :func:`find_edges` (auto probes the corpus via
    :func:`resolve_signature_unit`).

    Always cc grouping (matchset groups can overlap — not a partition).
    """
    from vid_dup_finder_lib_spark.operators.components import connected_components
    from vid_dup_finder_lib_spark.operators.dedup import (
        medoid_survivors,
        neardup_survivors,
        priority_survivors,
    )

    if survivor_rule not in ("min_id", "medoid", "quality"):
        raise ValueError(
            f"unknown survivor_rule {survivor_rule!r} (min_id | medoid | quality)"
        )
    if score_col is not None and survivor_rule != "quality":
        raise ValueError("score_col is only meaningful with survivor_rule='quality'")
    if score_col is not None and score_col not in docs.columns:
        raise ValueError(f"score_col {score_col!r} not in docs columns")
    tol = cfg.default_tolerance if tolerance is None else tolerance
    unit = _resolve_unit(docs, text_col, unit)
    # verification is the reference's tolerance radius either way; the
    # medoid rule additionally needs per-edge Jaccard mass, attached via a
    # 0-threshold predicate (a no-op filter) — the heavier shingle shuffle
    # is paid ONLY when that rule asks for it
    sigs = _materialize(
        build_signatures(docs, cfg, id_col, text_col, unit=unit), True
    )
    pairs, _quarantined = candidate_pairs(sigs, cfg)
    edges = _materialize(
        verified_edges(
            _materialize(pairs, True), sigs, cfg,
            tolerance=tol,
            jaccard_num_den=(0, 1) if survivor_rule == "medoid" else None,
        ),
        True,
    )
    cc = connected_components(edges).select(
        F.col("id").alias("__m"), F.col("component").alias("__c")
    )
    if survivor_rule == "min_id":
        kept_ids = neardup_survivors(
            docs, cc, id_col=id_col, member_col="__m", cluster_col="__c"
        ).select(F.col(id_col).alias("__kid"), "cluster_size")
    elif survivor_rule == "medoid":
        med = medoid_survivors(cc, edges, member_col="__m", cluster_col="__c")
        clustered = med.select(
            F.col("survivor_id").alias("__kid"),
            F.col("n_members").alias("cluster_size"),
        )
        singles = (
            docs.select(F.col(id_col).alias("__kid"))
            .join(cc.withColumnRenamed("__m", "__kid").select("__kid"),
                  "__kid", "left_anti")
            .select("__kid", F.lit(1).cast("long").alias("cluster_size"))
        )
        kept_ids = clustered.unionByName(singles)
    else:  # "quality" (validated above)
        scored_docs = docs.select(
            F.col(id_col),
            (
                F.col(score_col) if score_col is not None
                else F.length(F.col(text_col))
            ).cast("long").alias("__q"),
        )
        kept_ids = priority_survivors(
            scored_docs, cc, score_col="__q",
            id_col=id_col, member_col="__m", cluster_col="__c",
        ).select(F.col(id_col).alias("__kid"), "cluster_size")
    return docs.join(
        kept_ids, docs[id_col] == kept_ids["__kid"]
    ).drop("__kid")
