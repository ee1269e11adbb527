"""Shard packing + Gopher repetition + contamination scan: edge cases the
oracle queries can't isolate (boundary straddle, null weights, exact flag
thresholds, masked-hash semantics)."""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.packing import pack_shards


def _pack(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(4)
    return {
        r.doc_id: (r.shard_offset, r.shard_id)
        for r in pack_shards(df, budget=budget).collect()
    }


def test_pack_shards_boundary_straddle(spark):
    """A doc straddling the budget boundary belongs to the shard where it
    STARTS; the next doc opens the next shard."""
    got = _pack(spark, [(1, 800), (2, 800), (3, 800), (4, 100)], budget=1000)
    # offsets: 0, 800, 1600, 2400 -> shards 0, 0, 1, 2
    assert got == {1: (0, 0), 2: (800, 0), 3: (1600, 1), 4: (2400, 2)}


def test_pack_shards_exact_boundary_opens_new_shard(spark):
    got = _pack(spark, [(1, 1000), (2, 1000), (3, 1)], budget=1000)
    assert got == {1: (0, 0), 2: (1000, 1), 3: (2000, 2)}


def test_pack_shards_zero_weight_docs_ride_along(spark):
    got = _pack(spark, [(1, 0), (2, 500), (3, 0), (4, 600)], budget=1000)
    assert got[1] == (0, 0) and got[3] == (500, 0)
    assert got[4] == (500, 0)


def test_pack_shards_distributed_matches_serial(spark):
    """1000 docs across 16 partitions: the distributed prefix sum equals
    the serial cumulative sum exactly."""
    rows = [(i, (i * 37) % 97 + 1) for i in range(1000)]
    got = _pack(spark, rows, budget=5000)
    acc = 0
    for i, w in rows:  # already in doc_id order
        assert got[i] == (acc, acc // 5000), f"doc {i}"
        acc += w


def test_pack_shards_null_weight_raises(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="pack_shards"):
        pack_shards(df, budget=100).collect()
    with pytest.raises(ValueError, match="budget"):
        pack_shards(df, budget=0)


def test_gopher_flag_threshold_exact(spark):
    """dup*10 > line*3 — strictly greater: exactly 30 % duplicate lines
    does NOT flag, one more duplicate does."""
    from vid_dup_finder_lib_spark.functions.textstats import gopher_repetition_stats

    # 10 lines, 3 dups (30 %): not flagged; 10 lines, 4 dups: flagged
    rows = [
        (1, [f"l{i}" for i in range(7)] + ["l0", "l1", "l2"]),   # 3 dup
        (2, [f"l{i}" for i in range(6)] + ["l0", "l1", "l2", "l3"]),  # 4 dup
        (3, []),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    stats = gopher_repetition_stats(F.col("lines"), F.lit(100))
    got = {
        r.doc_id: (r.dup_line_count, r.dup_line_flag)
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in stats.items()]
        ).collect()
    }
    assert got[1] == (3, False)
    assert got[2] == (4, True)
    assert got[3] == (0, False)


def test_contamination_masking_and_counts(spark):
    from vid_dup_finder_lib_spark.functions.textstats import contamination_stats

    rows = [
        (1, "write to a.b@x.co or c@y.io and call 555-123-4567 ok"),
        (2, "clean text with no pii at all"),
        (3, "almost an email @ not.quite and 55-123-4567 short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = contamination_stats(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id", "text", *[c.alias(n) for n, c in stats.items()]
        ).collect()
    }
    assert (out[1].email_hits, out[1].phone_hits) == (2, 1)
    assert (out[2].email_hits, out[2].phone_hits) == (0, 0)
    assert (out[3].email_hits, out[3].phone_hits) == (0, 0)
    # the mask actually scrubbed: same text with spans replaced hashes like
    # the literal masked string
    import hashlib

    masked = "write to <EMAIL> or <EMAIL> and call <PHONE> ok"
    assert out[1].masked_md5 == hashlib.md5(masked.encode()).hexdigest()
    assert out[2].masked_md5 == hashlib.md5(rows[1][1].encode()).hexdigest()


def test_token_lines_chunking(spark):
    from vid_dup_finder_lib_spark.functions.textstats import token_lines

    rows = [(1, "a b c d e f g h i j"), (2, "x y"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.lines
        for r in df.select("doc_id", token_lines(F.col("text"), 4).alias("lines")).collect()
    }
    assert got[1] == ["a b c d", "e f g h", "i j"]
    assert got[2] == ["x y"]
    assert got[3] == []
    assert got[4] == []


def test_benchmark_contamination_ground_truth(spark):
    """Decontam flags exactly the docs sharing a verbatim 13-gram with the
    benchmark; shorter overlaps and short docs never flag; clean docs
    appear with zeros (a report omitting them would conflate 'not
    checked' with 'clean')."""
    from vid_dup_finder_lib_spark.operators.decontam import benchmark_contamination

    bench_text = " ".join(f"b{i}" for i in range(20))
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    gram13 = " ".join(f"b{i}" for i in range(13))
    rows = [
        (1, "clean words only " + " ".join(f"c{i}" for i in range(30))),
        (2, "prefix then " + gram13 + " then suffix"),          # 1 shared 13-gram (more via overlap)
        (3, " ".join(f"b{i}" for i in range(12)) + " unrelated tail of words here and more"),  # only 12 shared tokens
        (4, "tiny doc"),                                          # < 13 tokens
        (5, bench_text),                                          # full copy: all 8 13-grams
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
        for r in benchmark_contamination(train, bench, n=13).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}  # every training doc reported
    assert got[1] == (0, False)
    assert got[2][1] is True and got[2][0] >= 1
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (8, True)  # 20-token doc holds 20-13+1 = 8 distinct 13-grams


def test_benchmark_contamination_broadcast_valve(spark):
    """The broadcast side has a fail-fast cap: an oversized benchmark
    raises with the measured count instead of OOMing every executor."""
    from vid_dup_finder_lib_spark.operators.decontam import benchmark_contamination

    bench = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(5)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame([(1, "x " * 30)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_benchmark_ngrams"):
        benchmark_contamination(train, bench, n=13, max_benchmark_ngrams=10)
    # under the cap: runs fine
    out = benchmark_contamination(train, bench, n=13, max_benchmark_ngrams=1000)
    assert out.count() == 1


def test_eval_coverage_ground_truth(spark):
    """The reverse view: per-BENCH-doc coverage.  A bench doc fully copied
    into training reports 100 % (compromised); one whose 13-gram appears
    once reports exactly that; short bench docs report 0/0/false."""
    from vid_dup_finder_lib_spark.operators.decontam import eval_coverage

    b1 = " ".join(f"b{i}" for i in range(20))     # 8 distinct 13-grams
    b2 = " ".join(f"d{i}" for i in range(15))     # 3 distinct 13-grams
    b3 = "too short"                               # 0 13-grams
    bench = spark.createDataFrame(
        [(100, b1), (200, b2), (300, b3)], "doc_id long, text string"
    )
    gram13 = " ".join(f"d{i}" for i in range(13))  # b2's first 13-gram only
    train = spark.createDataFrame(
        [(1, b1), (2, "x " * 20 + gram13)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_ngrams, r.n_covered, r.compromised)
        for r in eval_coverage(train, bench, n=13).collect()
    }
    assert got[100] == (8, 8, True)       # fully burned
    assert got[200] == (3, 1, False)      # 1 of 3 < 1/2
    assert got[300] == (0, 0, False)      # nothing to cover
    # valve
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_benchmark_ngrams"):
        eval_coverage(train, bench, n=13, max_benchmark_ngrams=2)
