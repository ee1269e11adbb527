"""Streaming incremental near-dup dedup: exact + near duplicates detected
across micro-batches against the persisted survivor store; only novel docs
admitted; replayed/empty triggers are no-ops."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore
from vid_dup_finder_lib_spark.streaming.neardup import stream_neardup_dedup

CFG = SigConfig(num_perms=128, lsh_bands=128, seed=42)
SCHEMA = "url string, text string"
TOL = 0.1
DOCLEN = 600


def _texts():
    cb = CorpusBuilder(seed=31)
    a = cb.base_tokens(DOCLEN)
    b = cb.base_at_distance(a, 300)
    c = cb.base_at_distance(b, 300)
    d = cb.base_at_distance(c, 300)
    e = cb.base_at_distance(d, 300)
    t = CorpusBuilder.tokens_to_text
    return {
        "a": t(a),
        "b": t(b),
        "b_near": t(cb.member_at_distance(b, 20)),
        "b_near2": t(cb.member_at_distance(b, 25)),
        "c": t(c),
        "d": t(d),
        "e": t(e),
    }


def _run(spark, src, out, ckpt, store):
    return stream_neardup_dedup(
        spark, src, out, ckpt, store, SCHEMA, cfg=CFG, tolerance=TOL
    )


def _read_out(spark, out):
    return {
        (r["batch"], r["id"]): (r["canonical_id"], r["is_survivor"])
        for r in spark.read.parquet(out).collect()
    }


def test_incremental_neardup_across_batches(spark, tmp_path):
    tx = _texts()
    src = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    store = PartitionedSignatureStore(
        str(tmp_path / "store"), CFG, num_buckets=8
    )

    # batch 1: two distinct docs
    spark.createDataFrame(
        [Row(url="a1", text=tx["a"]), Row(url="b1", text=tx["b"])], SCHEMA
    ).coalesce(1).write.parquet(src)
    _run(spark, src, out, ckpt, store)
    got = _read_out(spark, out)
    assert got == {
        (0, "a1"): ("a1", True),
        (0, "b1"): ("b1", True),
    }
    assert {r["id"] for r in store.read(spark).collect()} == {"a1", "b1"}

    # batch 2: exact dup of a1, near dup of b1, in-batch dup pair (c2=c9),
    # and the pair's min id is the survivor
    spark.createDataFrame(
        [
            Row(url="z1", text=tx["a"]),        # exact dup -> a1
            Row(url="z2", text=tx["b_near"]),   # near dup -> b1
            Row(url="c2", text=tx["c"]),        # in-batch pair, min id wins
            Row(url="c9", text=tx["c"]),
            Row(url="d1", text=tx["d"]),        # novel
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt, store)
    got = _read_out(spark, out)
    assert got[(1, "z1")] == ("a1", False)
    assert got[(1, "z2")] == ("b1", False)
    assert got[(1, "c2")] == ("c2", True)
    assert got[(1, "c9")] == ("c2", False)
    assert got[(1, "d1")] == ("d1", True)
    assert {r["id"] for r in store.read(spark).collect()} == {
        "a1", "b1", "c2", "d1",
    }

    # batch 3: another near dup of b (vs the STORED canonical, not the
    # dropped z2) + one novel doc
    spark.createDataFrame(
        [Row(url="y1", text=tx["b_near2"]), Row(url="e1", text=tx["e"])],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt, store)
    got = _read_out(spark, out)
    assert got[(2, "y1")] == ("b1", False)
    assert got[(2, "e1")] == ("e1", True)
    survivors = {r["id"] for r in store.read(spark).collect()}
    assert survivors == {"a1", "b1", "c2", "d1", "e1"}

    # no new files: the trigger is a no-op (no new batch dirs, store same)
    _run(spark, src, out, ckpt, store)
    assert {b for (b, _i) in _read_out(spark, out)} == {0, 1, 2}
    assert {r["id"] for r in store.read(spark).collect()} == survivors


def test_replay_after_upsert_is_idempotent(spark, tmp_path):
    """The crash-replay property foreachBatch relies on: re-deriving
    canonicals for a batch whose survivors were ALREADY upserted yields the
    identical assignment (survivors self-match only via the excluded
    same-id edge; their batch partners re-match them as store edges and
    land on the same canonical)."""
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures
    from vid_dup_finder_lib_spark.streaming.neardup import assign_canonicals

    tx = _texts()
    store = PartitionedSignatureStore(
        str(tmp_path / "store"), CFG, num_buckets=8
    )
    batch = spark.createDataFrame(
        [
            Row(url="a1", text=tx["a"]),
            Row(url="a9", text=tx["a"]),        # in-batch dup of a1
            Row(url="b1", text=tx["b"]),
        ],
        SCHEMA,
    )
    sigs = build_signatures(batch, CFG, "url", "text").localCheckpoint(eager=True)
    first = sorted(
        map(tuple, assign_canonicals(spark, sigs, store, CFG, TOL).collect())
    )
    assert first == [
        ("a1", "a1", True), ("a9", "a1", False), ("b1", "b1", True),
    ]
    survivors = sigs.where(F.col("id").isin("a1", "b1"))
    store.write_full(survivors, id_col="id")
    # replay: same batch, store now already contains this batch's survivors
    replay = sorted(
        map(tuple, assign_canonicals(spark, sigs, store, CFG, TOL).collect())
    )
    assert replay == first
    # and a second upsert of the same survivors is a content no-op
    store.upsert(survivors, id_col="id")
    assert {r["id"] for r in store.read(spark).collect()} == {"a1", "b1"}


def test_html_only_stream_extracts_then_dedups(spark, tmp_path):
    """extract_html=True: crawl-native batches (url, html binary) are
    extracted inside each micro-batch; near-dups across batches still
    canonicalize to the stored survivor; a batch that already carries
    text refuses (mixed provenance)."""
    import pytest

    from vid_dup_finder_lib_spark.corpus import CorpusBuilder as CB

    texts = _texts()
    html_schema = "url string, html binary"

    def to_html(t):
        return CB.text_to_html(t, title="x")

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    store = PartitionedSignatureStore(str(tmp_path / "store"), CFG, num_buckets=4)

    b1 = [Row(url="a", html=to_html(texts["a"])), Row(url="b", html=to_html(texts["b"]))]
    spark.createDataFrame(b1, html_schema).coalesce(1).write.parquet(src)
    stream_neardup_dedup(
        spark, src, out, ckpt, store, html_schema, cfg=CFG, tolerance=TOL,
        extract_html=True,
    )
    b2 = [Row(url="zb", html=to_html(texts["b_near"])),  # near-dup of stored b
          Row(url="zc", html=to_html(texts["c"]))]
    spark.createDataFrame(b2, html_schema).coalesce(1).write.mode("append").parquet(src)
    stream_neardup_dedup(
        spark, src, out, ckpt, store, html_schema, cfg=CFG, tolerance=TOL,
        extract_html=True,
    )

    got = {
        r["id"]: (r["canonical_id"], r["is_survivor"])
        for r in spark.read.parquet(out).collect()
    }
    assert got["a"] == ("a", True) and got["b"] == ("b", True)
    assert got["zb"] == ("b", False)  # extracted text near-matched the store
    assert got["zc"] == ("zc", True)
    assert set(store.read(spark).select("id").toPandas()["id"]) == {"a", "b", "zc"}

    # a text-carrying batch under extract_html refuses
    mixed_schema = "url string, html binary, text string"
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [Row(url="m", html=to_html(texts["d"]), text=texts["d"])], mixed_schema
    ).coalesce(1).write.parquet(src2)
    with pytest.raises(Exception, match="mixed text provenance"):
        stream_neardup_dedup(
            spark, src2, str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
            PartitionedSignatureStore(str(tmp_path / "store2"), CFG, num_buckets=4),
            mixed_schema, cfg=CFG, tolerance=TOL, extract_html=True,
        )
