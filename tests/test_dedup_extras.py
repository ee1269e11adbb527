"""Dedup/ANN operator family vs brute-force oracles: simhash Hamming pairs,
ngram-Jaccard pairs, hyperplane-LSH ANN, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.functions.hashing import hamming64
from vid_dup_finder_lib_spark.operators.dedup import (
    ngram_jaccard_pairs,
    simhash_hamming_pairs,
)
from vid_dup_finder_lib_spark.operators.signatures import build_signatures

CFG = SigConfig(seed=42)


@pytest.fixture(scope="module")
def sigs(spark):
    cb = CorpusBuilder(seed=51)
    # intra_d=6 of 400 tokens keeps SimHash Hamming well inside radius 16
    cb.make_clusters(
        num_clusters=3, first_size=4, size_step=2, intra_d=6, inter_d=300, doclen=400
    )
    cb.add_singletons(10, 200, 500, site=7)
    docs = cb.to_spark(spark).localCheckpoint()
    return build_signatures(docs, CFG).localCheckpoint()


def test_simhash_pairs_match_bruteforce(spark, sigs):
    radius = 16
    got = {
        (r.id1, r.id2)
        for r in simhash_hamming_pairs(sigs, radius=radius).collect()
    }
    rows = sigs.select("id", "simhash").collect()
    expect = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a.simhash is None or b.simhash is None:
                continue
            if hamming64(a.simhash, b.simhash) <= radius:
                expect.add((min(a.id, b.id), max(a.id, b.id)))
    assert got == expect
    assert len(expect) > 0  # planted near-dups must be within radius


def test_ngram_jaccard_matches_bruteforce(spark, sigs):
    got = {
        (r.id1, r.id2): (r.inter_count, r.union_count)
        for r in ngram_jaccard_pairs(sigs, 1, 2).collect()
    }
    rows = sigs.select("id", "shingle_hashes").collect()
    expect = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            sa, sb = set(a.shingle_hashes), set(b.shingle_hashes)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if inter * 2 >= union:
                key = (min(a.id, b.id), max(a.id, b.id))
                expect[key] = (inter, union)
    assert got == expect
    assert len(expect) > 0


def test_ann_lsh_recall_vs_bruteforce(spark):
    from vid_dup_finder_lib_spark.operators.ann import brute_force_topk, lsh_bucket_topk

    rng = np.random.default_rng(52)
    dim, n = 16, 120
    # clustered vectors so top-1 neighbors are meaningful
    centers = rng.standard_normal((6, dim))
    vecs = centers[np.arange(n) % 6] + 0.1 * rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()

    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(df, df, k=1).collect()
    }
    approx = {
        (r.query_id, r.rank): r.neighbor_id
        for r in lsh_bucket_topk(df, k=1, dim=dim, n_tables=12, n_planes=6, seed=1).collect()
    }
    hits = sum(1 for k, v in exact.items() if approx.get(k) == v)
    assert hits / len(exact) >= 0.9  # ANN recall@1


def test_ann_lsh_multiprobe_recall_lift(spark):
    """Multi-probe (round-3 verdict item 7): probing the Hamming-1 buckets
    of the lowest-margin planes lifts recall@1 past 0.95 at a table count
    where single-probe sits well under 0.9 — same shuffle shape, query-side
    rows only.  Config chosen so the gap is wide on both sides (measured:
    1 probe 0.725, 3 probes 0.965)."""
    from vid_dup_finder_lib_spark.operators.ann import brute_force_topk, lsh_bucket_topk

    rng = np.random.default_rng(52)
    dim, n = 32, 200
    centers = rng.standard_normal((20, dim))
    vecs = centers[np.arange(n) % 20] + 0.35 * rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()

    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(df, df, k=1).collect()
    }

    def recall(n_probes):
        ap = {
            (r.query_id, r.rank): r.neighbor_id
            for r in lsh_bucket_topk(
                df, k=1, dim=dim, n_tables=4, n_planes=10, seed=1, n_probes=n_probes
            ).collect()
        }
        return sum(1 for k, v in exact.items() if ap.get(k) == v) / len(exact)

    r1, r3 = recall(1), recall(3)
    assert r1 < 0.9  # single-probe genuinely weak at this table count
    assert r3 >= 0.95
    assert r3 > r1


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF tier (k-means buckets + nprobe search) matches brute force on
    clustered vectors; k-means is deterministic (same seed -> same result)."""
    from vid_dup_finder_lib_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(53)
    dim, n = 16, 120
    centers = rng.standard_normal((6, dim))
    vecs = centers[np.arange(n) % 6] + 0.1 * rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).localCheckpoint()

    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(df, df, k=1).collect()
    }
    approx = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(df, k=1, dim=dim, n_centroids=8, nprobe=2, seed=2).collect()
    }
    hits = sum(1 for key, v in exact.items() if approx.get(key) == v)
    assert hits / len(exact) >= 0.9  # ANN recall@1

    c1 = kmeans_centroids(df, 8, dim, seed=2)
    c2 = kmeans_centroids(df, 8, dim, seed=2)
    assert np.allclose(c1, c2)
    assert c1.shape == (8, dim)


def test_multimodal_plumbing(spark):
    from vid_dup_finder_lib_spark.operators.multimodal import (
        extract_frame_features,
        frame_sample,
        media_metadata,
    )

    media = spark.createDataFrame(
        [
            ("m1", "image/fake", b"payload-one"),
            ("m2", "image/fake", b"payload-two"),
            ("m3", "image/fake", b""),
        ],
        "media_id string, mime string, payload binary",
    )
    feats = extract_frame_features(media, decoder="fake", n_frames=16, feature_dim=8)
    rows = feats.collect()
    ok = [r for r in rows if r.error is None]
    err = [r for r in rows if r.error is not None]
    assert len(ok) == 32 and len(err) == 1 and err[0].error == "EmptyPayload"
    # deterministic: same payload -> same features on recompute
    again = extract_frame_features(media, decoder="fake", n_frames=16, feature_dim=8).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))
    assert frame_sample(feats, every=8).where(F.col("error").isNull()).count() == 4

    meta = {r.media_id: r.n_bytes for r in media_metadata(media).collect()}
    assert meta == {"m1": 11, "m2": 11, "m3": 0}

    # decoder="real" now actually decodes (PPM/WAV — tests/test_multimodal_real.py);
    # a payload no in-container codec reads becomes an error VALUE, not a raise
    real = {r.media_id: r.error for r in extract_frame_features(media, decoder="real").collect()}
    assert real["m1"].startswith("UnsupportedFormat:")
    assert real["m3"] == "EmptyPayload"
    with pytest.raises(ValueError):
        extract_frame_features(media, decoder="nope")


# ---------------------------------------------------------------------------
# neardup_survivors (fuzzy-dedup end product)
# ---------------------------------------------------------------------------


def test_neardup_survivors_semantics(spark):
    from vid_dup_finder_lib_spark.operators.dedup import neardup_survivors

    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    # two clusters {1,3,5} and {2,8}; labels deliberately NOT the min
    # member to prove the explicit min(survivor) rule, plus 0,4,6,7,9 single
    cc = spark.createDataFrame(
        [(1, 99), (3, 99), (5, 99), (2, 77), (8, 77)],
        "doc_id long, cluster_id long",
    )
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in neardup_survivors(docs, cc).collect()
    }
    assert got == {1: 3, 2: 2, 0: 1, 4: 1, 6: 1, 7: 1, 9: 1}


def test_neardup_survivors_partitioning_invariance(spark):
    from vid_dup_finder_lib_spark.operators.dedup import neardup_survivors

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    cc = spark.createDataFrame(
        [(i, i // 5 * 5) for i in range(0, 100)],
        "doc_id long, cluster_id long",
    )
    a = sorted(map(tuple, neardup_survivors(docs.repartition(1), cc.repartition(1)).collect()))
    b = sorted(map(tuple, neardup_survivors(docs.repartition(13), cc.repartition(7)).collect()))
    assert a == b
    assert len(a) == 20 + 100  # 20 five-doc clusters + 100 singletons


def test_priority_survivors_semantics(spark):
    """Max-score member wins (NOT the min id), score ties break to min id,
    singletons carry their own score."""
    from vid_dup_finder_lib_spark.operators.dedup import priority_survivors

    docs = spark.createDataFrame(
        [(0, 10), (1, 5), (2, 40), (3, 90), (4, 7), (5, 20), (6, 40), (7, 3)],
        "doc_id long, quality long",
    )
    # cluster 99 = {1,3,5}: best score 90 at id 3 (min id 1 would be wrong)
    # cluster 77 = {2,6}: scores tie at 40 -> min id 2
    cc = spark.createDataFrame(
        [(1, 99), (3, 99), (5, 99), (2, 77), (6, 77)],
        "doc_id long, cluster_id long",
    )
    got = {
        r["doc_id"]: (r["cluster_size"], r["score"])
        for r in priority_survivors(docs, cc, score_col="quality").collect()
    }
    assert got == {3: (3, 90), 2: (2, 40), 0: (1, 10), 4: (1, 7), 7: (1, 3)}


def test_priority_survivors_null_scores(spark):
    """Null score ranks BELOW every real score; an all-null cluster falls
    back to min id with score null instead of silently emitting no
    survivor (score == max(score) is NULL for such clusters — the bug the
    sentinel ordering key exists to prevent)."""
    from vid_dup_finder_lib_spark.operators.dedup import priority_survivors

    docs = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, None), (5, None), (6, 8)],
        "doc_id long, quality long",
    )
    # cluster 10 = {1,2}: null vs 5 -> 2 wins
    # cluster 20 = {3,4}: ALL null -> min id 3 survives, score null
    cc = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)],
        "doc_id long, cluster_id long",
    )
    got = {
        r["doc_id"]: (r["cluster_size"], r["score"])
        for r in priority_survivors(docs, cc, score_col="quality").collect()
    }
    assert got == {2: (2, 5), 3: (2, None), 5: (1, None), 6: (1, 8)}


def test_priority_survivors_partitioning_invariance(spark):
    from vid_dup_finder_lib_spark.operators.dedup import priority_survivors

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 37 % 101).alias("quality")
    )
    cc = spark.createDataFrame(
        [(i, i // 5 * 5) for i in range(0, 100)],
        "doc_id long, cluster_id long",
    )
    a = sorted(map(tuple, priority_survivors(
        docs.repartition(1), cc.repartition(1), score_col="quality").collect()))
    b = sorted(map(tuple, priority_survivors(
        docs.repartition(13), cc.repartition(7), score_col="quality").collect()))
    assert a == b
    assert len(a) == 20 + 100  # 20 five-doc clusters + 100 singletons
    # every cluster survivor's score is the max over its members
    scores = {i: i * 37 % 101 for i in range(200)}
    for doc_id, size, score in a:
        if size == 5:
            members = [m for m in range(100) if m // 5 * 5 == doc_id // 5 * 5]
            assert score == max(scores[m] for m in members)
            assert scores[doc_id] == score


# ---------------------------------------------------------------------------
# shingle_containment_pairs (asymmetric / superset dedup)
# ---------------------------------------------------------------------------


def test_containment_catches_superset_jaccard_misses(spark):
    """A doc fully embedded in a 3x wrapper: containment ~1 (caught at
    9/10) while symmetric Jaccard ~1/3 (missed at 2/5) and the 1.10 length
    band fails — the exact class the operator exists for."""
    from vid_dup_finder_lib_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    words = [f"w{i}" for i in range(60)]
    a = " ".join(words)
    wrapper = " ".join(words + [f"q{w}" for w in words] + [f"z{w}" for w in words])
    unrelated = " ".join(f"u{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, a), (2, wrapper), (3, unrelated)], "doc_id long, text string"
    )
    sigs = build_signatures(docs, CFG, id_col="doc_id", text_col="text")
    cont = {
        (r["id1"], r["id2"]) for r in shingle_containment_pairs(sigs, 9, 10).collect()
    }
    assert cont == {(1, 2)}
    jac = {
        (r["id1"], r["id2"]) for r in ngram_jaccard_pairs(sigs, 2, 5).collect()
    }
    assert (1, 2) not in jac
