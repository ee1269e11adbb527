"""Signature property tests — the metric-space unit tests of the reference
(``video_hash.rs:319-372``: triangle inequality, symmetry, zero-distance on
identity; 1000 seeded iterations) re-expressed for SimHash Hamming and
MinHash, plus MinHash-accuracy-vs-exact-Jaccard (the property LSH recall
rests on).
"""

import numpy as np
import pytest

from vid_dup_finder_lib_spark.functions.hashing import (
    hamming64,
    minhash_reference,
    simhash_reference,
)


def _rand_hashes(rng, n):
    return rng.integers(-(2**62), 2**62, size=n).tolist()


@pytest.mark.parametrize("seed", [1, 2])
def test_simhash_metric_properties(seed):
    rng = np.random.default_rng(seed)
    for _ in range(1000):
        a = simhash_reference(_rand_hashes(rng, 30))
        b = simhash_reference(_rand_hashes(rng, 30))
        c = simhash_reference(_rand_hashes(rng, 30))
        dab, dba = hamming64(a, b), hamming64(b, a)
        assert dab == dba  # symmetry (video_hash.rs:360-371)
        assert hamming64(a, c) <= dab + hamming64(b, c)  # triangle (:326-338)
        assert hamming64(a, a) == 0  # identity (:341-357)


def test_identical_docs_zero_distance():
    rng = np.random.default_rng(3)
    h = _rand_hashes(rng, 50)
    assert simhash_reference(h) == simhash_reference(list(h))
    assert minhash_reference(h, 128, 42) == minhash_reference(list(h), 128, 42)


def test_minhash_estimates_jaccard():
    """128-perm MinHash match fraction ~ exact Jaccard (±0.15 at n=128)."""
    rng = np.random.default_rng(4)
    universe = rng.integers(-(2**62), 2**62, size=400).tolist()
    a = set(universe[:300])
    b = set(universe[100:400])  # |∩|=200, |∪|=400 → J=0.5
    ja = len(a & b) / len(a | b)
    ma = minhash_reference(sorted(a), 128, 42)
    mb = minhash_reference(sorted(b), 128, 42)
    est = sum(x == y for x, y in zip(ma, mb)) / 128
    assert abs(est - ja) < 0.15


def test_minhash_order_invariant():
    rng = np.random.default_rng(5)
    h = _rand_hashes(rng, 60)
    shuffled = list(h)
    rng.shuffle(shuffled)
    assert minhash_reference(h, 64, 7) == minhash_reference(shuffled, 64, 7)
    assert simhash_reference(h) == simhash_reference(shuffled)


def test_spark_udfs_match_reference(spark):
    """The Arrow-vectorized UDF path returns exactly the reference kernels'
    values (flattened-reduceat bookkeeping, empty rows, batching)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.functions.hashing import (
        minhash_udf_factory,
        simhash_udf_factory,
    )

    rng = np.random.default_rng(6)
    rows = [
        {"i": 0, "h": _rand_hashes(rng, 25)},
        {"i": 1, "h": []},
        {"i": 2, "h": _rand_hashes(rng, 1)},
        {"i": 3, "h": _rand_hashes(rng, 200)},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), "i long, h array<long>")
    out = (
        df.select(
            "i",
            minhash_udf_factory(16, 42)(F.col("h")).alias("mh"),
            simhash_udf_factory()(F.col("h")).alias("sh"),
        )
        .orderBy("i")
        .collect()
    )
    for r, row in zip(out, rows):
        if not row["h"]:
            assert r.mh is None and r.sh is None
        else:
            assert r.mh == minhash_reference(row["h"], 16, 42)
            assert r.sh == simhash_reference(row["h"])


def test_sampling_policy(spark):
    """S5 analog (video_hash_builder.rs:85-157): signature covers tokens
    [skip, skip+max) with short-doc fallback; doclen stays the full count."""
    import pandas as pd
    from vid_dup_finder_lib_spark.config import SigConfig
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures

    cfg = SigConfig(skip_tokens=5, max_tokens=10, seed=42)
    long_doc = " ".join(f"w{i}" for i in range(40))
    short_doc = " ".join(f"w{i}" for i in range(4))
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["long", "short"], "text": [long_doc, short_doc]})
    )
    rows = {r.id: r for r in build_signatures(df, cfg).collect()}
    assert rows["long"].doclen == 40            # duration analog: full length
    assert rows["long"].shingle_count == 8      # 10-token window -> 8 shingles
    assert len(rows["long"].token_hashes) == 10
    # short doc falls back to its full stream (here still < shingle_k+skip)
    assert rows["short"].doclen == 4
    assert rows["short"].shingle_count == 2     # fallback window = all 4 tokens

    # sampled window [5, 15) equals the signature of the corresponding slice
    plain = SigConfig(seed=42)
    sliced = " ".join(f"w{i}" for i in range(5, 15))
    df2 = spark.createDataFrame(pd.DataFrame({"url": ["s"], "text": [sliced]}))
    sliced_sig = build_signatures(df2, plain).collect()[0]
    assert rows["long"].minhash == sliced_sig.minhash
    assert rows["long"].simhash == sliced_sig.simhash
