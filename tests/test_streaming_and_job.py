"""Structured Streaming ingest + spark-submit job CLI smoke tests."""

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import DOCS_SCHEMA, CorpusBuilder

CFG = SigConfig(num_perms=128, lsh_bands=128, seed=42)


def test_stream_signatures_available_now(spark, tmp_path):
    from vid_dup_finder_lib_spark.streaming.ingest import (
        read_signature_table,
        stream_signatures,
    )

    src = str(tmp_path / "docs")
    tgt = str(tmp_path / "sigs")
    ckpt = str(tmp_path / "ckpt")

    cb = CorpusBuilder(seed=71)
    cb.add_singletons(12, 300, 500, site=4)
    cb.to_spark(spark, partitions=2).write.parquet(src)

    stream_signatures(spark, src, tgt, ckpt, CFG, schema=DOCS_SCHEMA)
    first = read_signature_table(spark, tgt)
    assert first.count() == 12

    # a second drop of files is picked up incrementally (streaming offsets)
    cb2 = CorpusBuilder(seed=72)
    cb2.add_singletons(5, 300, 500, site=5)
    cb2.to_spark(spark, partitions=1).write.mode("append").parquet(src)
    stream_signatures(spark, src, tgt, ckpt, CFG, schema=DOCS_SCHEMA)
    assert read_signature_table(spark, tgt).count() == 17


def test_stream_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: in-batch dups collapse to the
    min id; later-batch dups of already-seen content are dropped via the
    state store; new content still flows."""
    from pyspark.sql import Row

    from vid_dup_finder_lib_spark.streaming.dedup import stream_exact_dedup

    src = str(tmp_path / "docs")
    tgt = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, text string"

    b1 = [
        Row(url="u3", text="alpha beta gamma"),
        Row(url="u1", text="alpha beta gamma"),   # in-batch dup, min id wins
        Row(url="u2", text="delta epsilon zeta"),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
    stream_exact_dedup(spark, src, tgt, ckpt, schema)
    got = {(r.content_hash, r.id): r.n_dups_in_batch for r in spark.read.parquet(tgt).collect()}
    ids = {i for _, i in got}
    assert ids == {"u1", "u2"}
    assert sorted(got.values()) == [1, 2]

    b2 = [
        Row(url="u9", text="alpha beta gamma"),   # dup of batch-1 content
        Row(url="u4", text="brand new document"),
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    stream_exact_dedup(spark, src, tgt, ckpt, schema)
    ids2 = {r.id for r in spark.read.parquet(tgt).collect()}
    assert ids2 == {"u1", "u2", "u4"}  # u9 swallowed by state


def test_stream_dedup_null_text_not_collapsed(spark, tmp_path):
    """sha2(null) is null: null-text docs must NOT share one state group and
    be swallowed as 'duplicates' of each other — every null-text doc is
    emitted (each under a per-id synthetic key), matching the batch path's
    exclusion of null hashes from survivor selection."""
    from pyspark.sql import Row

    from vid_dup_finder_lib_spark.streaming.dedup import stream_exact_dedup

    src = str(tmp_path / "docs")
    tgt = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, text string"

    rows = [
        Row(url="n1", text=None),
        Row(url="n2", text=None),
        Row(url="u1", text="real content here"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream_exact_dedup(spark, src, tgt, ckpt, schema)
    ids = {r.id for r in spark.read.parquet(tgt).collect()}
    assert ids == {"n1", "n2", "u1"}

    # a second null-text doc in a later batch is also new, never state-dropped
    spark.createDataFrame([Row(url="n3", text=None)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream_exact_dedup(spark, src, tgt, ckpt, schema)
    ids2 = {r.id for r in spark.read.parquet(tgt).collect()}
    assert ids2 == {"n1", "n2", "n3", "u1"}


def test_job_cli_end_to_end(spark, tmp_path):
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=73)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=400
    )
    docs_path = str(tmp_path / "docs")
    cb.to_spark(spark, partitions=2).write.parquet(docs_path)
    out_path = str(tmp_path / "groups")

    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.100",
            "--output", out_path,
        ]
    )
    assert rc == 0
    groups = spark.read.parquet(out_path)
    sizes = sorted(r["count"] for r in groups.groupBy("cluster_id").count().collect())
    assert sizes == [4, 5]


def test_job_cli_strip_boilerplate(spark, tmp_path):
    """--strip-boilerplate (the --cropdetect analog) wires the pre-signature
    strip stage into the checkpointed pipeline; a corpus-wide header line is
    removed and grouping is unchanged."""
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=75)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=400
    )
    docs = cb.to_spark(spark, partitions=2).withColumn(
        "text", F.concat(F.lit("shared site header nav line\n"), F.col("text"))
    )
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    out_path = str(tmp_path / "groups")

    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.100",
            "--output", out_path,
            "--strip-boilerplate",
            "--reload-errs",
        ]
    )
    assert rc == 0
    groups = spark.read.parquet(out_path)
    sizes = sorted(r["count"] for r in groups.groupBy("cluster_id").count().collect())
    assert sizes == [4, 5]
    # the strip ran as its own checkpointed stage and removed the header
    stripped = spark.read.parquet(str(tmp_path / "ckpt" / "docs_stripped" / "data"))
    assert stripped.where(F.col("text").contains("shared site header")).count() == 0
    assert stripped.count() == 9


def test_job_json_and_unique_outputs(spark, tmp_path):
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=74)
    cb.make_clusters(
        num_clusters=1, first_size=3, size_step=0, intra_d=10, inter_d=0, doclen=300
    )
    cb.add_singletons(4, 200, 400, site=6)
    docs_path = str(tmp_path / "docs")
    cb.to_spark(spark, partitions=2).write.parquet(docs_path)

    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.050",
            "--output", str(tmp_path / "groups.json"),
            "--output-format", "json",
            "--output-unique", str(tmp_path / "unique"),
        ]
    )
    assert rc == 0
    groups = spark.read.json(str(tmp_path / "groups.json"))
    rows = groups.collect()
    assert len(rows) == 1 and len(rows[0].members) == 3
    assert spark.read.parquet(str(tmp_path / "unique")).count() == 4


def test_job_cli_restore_and_list_snapshots(spark, tmp_path, capsys):
    """--restore / --list-snapshots: the operational face of the K-deep
    snapshot retention (the reference app's timestamped match-DB backups).
    A clobbered stage is restored from the CLI without a docs scan."""
    import json as _json

    from vid_dup_finder_lib_spark.plans import job
    from vid_dup_finder_lib_spark.plans.checkpoint import CheckpointStore
    from vid_dup_finder_lib_spark.config import DEFAULT_CONFIG

    cb = CorpusBuilder(seed=74)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=400
    )
    docs_path = str(tmp_path / "docs")
    cb.to_spark(spark, partitions=2).write.parquet(docs_path)
    ckpt = str(tmp_path / "ckpt")

    rc = job.main(["--docs", docs_path, "--checkpoint", ckpt, "--tolerance", "0.100"])
    assert rc == 0
    capsys.readouterr()

    # clobber the groups stage the way a bad run would (same fingerprint)
    store = CheckpointStore(
        ckpt, DEFAULT_CONFIG,
        extra_fingerprint={
            "canonicalize_urls": False,
            "strip_boilerplate": False,
            "boilerplate_min_df": [1, 2],
        },
    )
    good_count = store.read(spark, "groups").count()
    store.write("groups", spark.range(2).selectExpr("id as cluster_id", "id"))
    assert store.read(spark, "groups").count() == 2

    rc = job.main(["--checkpoint", ckpt, "--list-snapshots"])
    assert rc == 0
    listing = _json.loads(capsys.readouterr().out)
    assert listing["groups"]  # the retired good generation is retained

    rc = job.main(["--checkpoint", ckpt, "--restore", "groups"])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out)
    assert res["restored"] == "groups"
    assert store.read(spark, "groups").count() == good_count


def test_job_cli_quality_gate(spark, tmp_path):
    """--quality-gate: docs failing the Gopher repetition/short-doc flags
    are dropped in a checkpointed stage (durable lineage, no silent loss);
    clean docs group exactly as without the gate."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=76)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=400
    )
    docs = cb.to_spark(spark, partitions=2)
    # plant: one doc that is one 8-token line repeated 20x (dup-line frac
    # ~0.95 >> 0.3) and one 5-token doc (< 50-token cutoff)
    junk = spark.createDataFrame(
        [
            Row(
                url="junk://repetitive",
                warc_ts=docs.select("warc_ts").first()[0],
                html=bytearray(b""),
                text=" ".join(["spam spam spam spam wall of repeated text"] * 20),
                lang="en",
            ),
            Row(
                url="junk://short",
                warc_ts=docs.select("warc_ts").first()[0],
                html=bytearray(b""),
                text="too short to train on",
                lang="en",
            ),
        ],
        docs.schema,
    )
    docs_path = str(tmp_path / "docs")
    docs.unionByName(junk).write.parquet(docs_path)
    out_path = str(tmp_path / "groups")
    ckpt = str(tmp_path / "ckpt")

    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", ckpt,
            "--tolerance", "0.100",
            "--output", out_path,
            "--quality-gate",
        ]
    )
    assert rc == 0
    kept = spark.read.parquet(str(tmp_path / "ckpt" / "docs_quality" / "data"))
    assert kept.count() == 9  # both junk docs dropped, durable in lineage
    assert kept.where(F.col("url").startswith("junk://")).count() == 0
    groups = spark.read.parquet(out_path)
    sizes = sorted(r["count"] for r in groups.groupBy("cluster_id").count().collect())
    assert sizes == [4, 5]


def test_job_cli_dedup_paragraphs(spark, tmp_path):
    """--dedup-paragraphs: the RefinedWeb first-occurrence-wins rewrite runs
    as a checkpointed stage — a shared paragraph survives only in the
    lexicographically-first url's doc, drop counts are durable lineage, and
    downstream grouping still works on the rewritten text."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=77)
    cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=10, inter_d=200, doclen=400
    )
    docs = cb.to_spark(spark, partitions=2)
    ts = docs.select("warc_ts").first()[0]
    shared = "identical promo paragraph injected into both docs here now"
    extra = spark.createDataFrame(
        [
            Row(url="zz://a", warc_ts=ts, html=bytearray(b""),
                text=shared + " plus alpha specific trailing content one two",
                lang="en"),
            Row(url="zz://b", warc_ts=ts, html=bytearray(b""),
                text=shared + " plus beta specific trailing content três quatro",
                lang="en"),
        ],
        docs.schema,
    )
    docs_path = str(tmp_path / "docs")
    docs.unionByName(extra).write.parquet(docs_path)
    ckpt = str(tmp_path / "ckpt")
    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", ckpt,
            "--tolerance", "0.100",
            "--dedup-paragraphs",
        ]
    )
    assert rc == 0
    stage = spark.read.parquet(str(tmp_path / "ckpt" / "docs_paragraphs" / "data"))
    rows = {r["url"]: r for r in stage.where(F.col("url").startswith("zz://")).collect()}
    assert set(rows) == {"zz://a", "zz://b"}
    # first url keeps the shared 8-token line; second loses exactly it
    assert rows["zz://a"]["n_kept"] == rows["zz://a"]["n_lines"]
    assert rows["zz://b"]["n_kept"] == rows["zz://b"]["n_lines"] - 1
    assert shared.split()[0] in rows["zz://a"]["text"]
    assert rows["zz://b"]["text"].startswith("plus beta") or shared.split()[0] not in rows["zz://b"]["text"]


def test_job_cli_dedup_spans(spark, tmp_path):
    """--dedup-spans: the ExactSubstr rewrite runs as a checkpointed stage —
    a 25-token quote duplicated across two docs survives only in the
    lexicographically-first url's doc, removal counts are durable lineage,
    and the rest of the pipeline still runs on the rewritten text."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=79)
    cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=10, inter_d=200, doclen=400
    )
    docs = cb.to_spark(spark, partitions=2)
    ts = docs.select("warc_ts").first()[0]
    quote = " ".join(f"quoteword{i}" for i in range(25))
    extra = spark.createDataFrame(
        [
            Row(url="zz://a", warc_ts=ts, html=bytearray(b""),
                text=quote + " " + " ".join(f"alphatail{i}" for i in range(8)),
                lang="en"),
            Row(url="zz://b", warc_ts=ts, html=bytearray(b""),
                text=quote + " " + " ".join(f"betatail{i}" for i in range(8)),
                lang="en"),
        ],
        docs.schema,
    )
    docs_path = str(tmp_path / "docs")
    docs.unionByName(extra).write.parquet(docs_path)
    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.100",
            "--dedup-spans", "--span-k", "20",
        ]
    )
    assert rc == 0
    stage = spark.read.parquet(str(tmp_path / "ckpt" / "docs_spans" / "data"))
    rows = {r["url"]: r for r in stage.where(F.col("url").startswith("zz://")).collect()}
    assert set(rows) == {"zz://a", "zz://b"}
    # min url keeps the quote verbatim; the other loses exactly those 25 tokens
    assert rows["zz://a"]["removed_tokens"] == 0
    assert rows["zz://a"]["text"].startswith("quoteword0 ")
    assert rows["zz://b"]["removed_tokens"] == 25
    assert rows["zz://b"]["text"] == " ".join(f"betatail{i}" for i in range(8))
    # corpus-global stage refuses to replay on an isolated batch
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="CORPUS-GLOBAL"):
        job.main(
            [
                "--docs", docs_path,
                "--checkpoint", str(tmp_path / "ckpt"),
                "--incremental-add", docs_path,
                "--output", str(tmp_path / "out_inc"),
                "--dedup-spans",
            ]
        )


def test_job_cli_composed_rewrite_stages(spark, tmp_path):
    """--dedup-paragraphs + --dedup-spans + --quality-gate compose: each
    checkpointed stage exists with its lineage, later stages consume the
    previous rewrite's text, and the pipeline completes end to end."""
    from pyspark.sql import Row

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=81)
    cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=10, inter_d=200, doclen=400
    )
    docs = cb.to_spark(spark, partitions=2)
    ts = docs.select("warc_ts").first()[0]
    quote = " ".join(f"qw{i}" for i in range(25))
    para = "shared promo paragraph appearing in both docs right here now"
    extra = spark.createDataFrame(
        [
            # the quote is OFFSET by one token in b: the paragraph stage's
            # positional 8-token re-lining then sees different lines (only
            # the shared leading para line dedups), while the position-
            # independent span stage still finds the 25-token run
            Row(url="zz://a", warc_ts=ts, html=bytearray(b""),
                text=para + " " + quote + " " + " ".join(f"at{i}" for i in range(60)),
                lang="en"),
            Row(url="zz://b", warc_ts=ts, html=bytearray(b""),
                text=para + " pad0 " + quote + " " + " ".join(f"bt{i}" for i in range(60)),
                lang="en"),
        ],
        docs.schema,
    )
    docs_path = str(tmp_path / "docs")
    docs.unionByName(extra).write.parquet(docs_path)
    rc = job.main(
        [
            "--docs", docs_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.100",
            "--dedup-paragraphs",
            "--dedup-spans", "--span-k", "20",
            "--quality-gate", "--quality-min-tokens", "10",
        ]
    )
    assert rc == 0
    for stage in ("docs_quality", "docs_paragraphs", "docs_spans"):
        assert (tmp_path / "ckpt" / stage / "data").exists(), stage
    spans = spark.read.parquet(str(tmp_path / "ckpt" / "docs_spans" / "data"))
    rows = {r["url"]: r for r in spans.where(
        spans["url"].startswith("zz://")).collect()}
    # the paragraph stage removed the shared leading line from the LATER
    # doc; the span stage then cuts the misaligned 25-token quote from the
    # non-canonical doc — both lineages visible, text flows through
    assert set(rows) == {"zz://a", "zz://b"}
    assert rows["zz://a"]["removed_tokens"] == 0
    assert rows["zz://b"]["removed_tokens"] == 25
    assert "qw0" in rows["zz://a"]["text"]
    assert "qw0" not in rows["zz://b"]["text"]
    assert all(f"bt{i}" in rows["zz://b"]["text"] for i in (0, 59))


def test_job_cli_decontam_stage(spark, tmp_path):
    """--decontam: training docs sharing a verbatim 13-gram with the
    benchmark corpus are dropped in a checkpointed stage; clean docs
    survive and group as usual."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=78)
    cb.make_clusters(
        num_clusters=1, first_size=5, size_step=0, intra_d=20, inter_d=200, doclen=400
    )
    docs = cb.to_spark(spark, partitions=2)
    ts = docs.select("warc_ts").first()[0]
    # leak: one training doc embeds a benchmark item verbatim
    bench_text = "the quick brown fox jumps over the lazy dog again and again today"
    leaked = spark.createDataFrame(
        [Row(url="leak://d1", warc_ts=ts, html=bytearray(b""),
             text="padding before the leak " + bench_text + " padding after",
             lang="en")],
        docs.schema,
    )
    docs_path = str(tmp_path / "docs")
    docs.unionByName(leaked).write.parquet(docs_path)
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [Row(doc_id=1, text=bench_text)], "doc_id long, text string"
    ).write.parquet(bench_path)

    ckpt = str(tmp_path / "ckpt")
    rc = job.main([
        "--docs", docs_path, "--checkpoint", ckpt, "--tolerance", "0.100",
        "--decontam", bench_path, "--id-col", "url",
    ])
    assert rc == 0
    kept = spark.read.parquet(str(tmp_path / "ckpt" / "docs_decontam" / "data"))
    assert kept.count() == 5
    assert kept.where(F.col("url") == "leak://d1").count() == 0


def test_job_cli_extract_html_creates_text(spark, tmp_path):
    """--extract-html: a corpus WITHOUT a text column (the raw crawl shape:
    url, warc_ts, html) gets its text built by the frozen extractor as a
    checkpointed first stage; grouping matches the text-based run."""
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=91)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    raw_path = str(tmp_path / "raw")
    docs.drop("text").write.parquet(raw_path)
    out_path = str(tmp_path / "groups")
    rc = job.main(
        [
            "--docs", raw_path,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--tolerance", "0.100",
            "--extract-html",
            "--output", out_path,
        ]
    )
    assert rc == 0
    groups = spark.read.parquet(out_path)
    sizes = sorted(r["count"] for r in groups.groupBy("cluster_id").count().collect())
    assert sizes == [4, 5]
    # the extracted stage is durable and carries no binary column
    ext = spark.read.parquet(str(tmp_path / "ckpt" / "docs_extracted" / "data"))
    assert "text" in ext.columns and "html" not in ext.columns


def test_job_cli_extract_html_validates_invariant(spark, tmp_path):
    """--extract-html with an EXISTING text column validates the per-row
    invariant text == extract(html) and refuses on mismatch."""
    import pytest
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=92)
    cb.make_clusters(
        num_clusters=1, first_size=4, size_step=0, intra_d=20, inter_d=200, doclen=200
    )
    docs = cb.to_spark(spark, partitions=2)
    # tamper ONE row's text so it no longer matches its html
    tampered = docs.withColumn(
        "text",
        F.when(F.col("url") == docs.select("url").orderBy("url").limit(1)
               .collect()[0][0], F.lit("stale text from another pipeline"))
        .otherwise(F.col("text")),
    )
    bad_path = str(tmp_path / "bad")
    tampered.write.parquet(bad_path)
    with pytest.raises(ValueError, match="1 rows violate"):
        job.main(
            [
                "--docs", bad_path,
                "--checkpoint", str(tmp_path / "ckpt_bad"),
                "--tolerance", "0.100",
                "--extract-html",
            ]
        )
    # untampered docs pass validation and run to completion
    good_path = str(tmp_path / "good")
    docs.write.parquet(good_path)
    rc = job.main(
        [
            "--docs", good_path,
            "--checkpoint", str(tmp_path / "ckpt_good"),
            "--tolerance", "0.100",
            "--extract-html",
            "--output", str(tmp_path / "out_good"),
        ]
    )
    assert rc == 0


def test_job_cli_extract_html_incremental_batch(spark, tmp_path):
    """--incremental-add with --extract-html: a batch shipped as raw html
    (no text column) is extracted with the same frozen rule before the
    fold; the result equals a full job over the union corpus."""
    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=93)
    cb.make_clusters(
        num_clusters=2, first_size=3, size_step=1, intra_d=20, inter_d=200, doclen=250
    )
    all_docs = cb.to_spark(spark, partitions=2).localCheckpoint()
    urls = sorted(r["url"] for r in all_docs.select("url").collect())
    batch_urls = set(urls[:2])
    base = all_docs.where(~all_docs.url.isin(*batch_urls))
    batch = all_docs.where(all_docs.url.isin(*batch_urls))

    base_path = str(tmp_path / "base")
    base.drop("text").write.parquet(base_path)
    batch_path = str(tmp_path / "batch")
    batch.drop("text").write.parquet(batch_path)
    union_path = str(tmp_path / "union")
    all_docs.drop("text").write.parquet(union_path)

    ck = str(tmp_path / "ckpt")
    rc = job.main(
        ["--docs", base_path, "--checkpoint", ck, "--tolerance", "0.100",
         "--extract-html", "--output", str(tmp_path / "g0")]
    )
    assert rc == 0
    rc = job.main(
        ["--checkpoint", ck, "--tolerance", "0.100", "--extract-html",
         "--incremental-add", batch_path, "--output", str(tmp_path / "g1")]
    )
    assert rc == 0

    rc = job.main(
        ["--docs", union_path, "--checkpoint", str(tmp_path / "ckpt_full"),
         "--tolerance", "0.100", "--extract-html",
         "--output", str(tmp_path / "g_full")]
    )
    assert rc == 0
    inc = {
        (r["id"], r["cluster_id"])
        for r in spark.read.parquet(str(tmp_path / "g1")).collect()
    }
    full = {
        (r["id"], r["cluster_id"])
        for r in spark.read.parquet(str(tmp_path / "g_full")).collect()
    }
    assert inc == full


def test_job_cli_report_mode(spark, tmp_path):
    """--report: read-only ops reports over a completed checkpoint — size
    histogram (with the singleton bucket when --docs is given) and a
    cluster-coherent split whose members never straddle splits."""
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=94)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    ck = str(tmp_path / "ckpt")
    assert job.main(
        ["--docs", docs_path, "--checkpoint", ck, "--tolerance", "0.100",
         "--output", str(tmp_path / "groups")]
    ) == 0

    rep = str(tmp_path / "report")
    assert job.main(
        ["--checkpoint", ck, "--report", rep, "--docs", docs_path]
    ) == 0

    hist = spark.read.parquet(rep + "/sizes.parquet")
    got = {r["cluster_size"]: r["n_clusters"] for r in hist.collect()}
    assert got.get(4) == 1 and got.get(5) == 1
    # histogram (incl. singletons) accounts for the whole corpus
    n_total = docs.count()
    assert (
        hist.agg(F.sum(F.col("cluster_size") * F.col("n_clusters"))).collect()[0][0]
        == n_total
    )

    splits = spark.read.parquet(rep + "/splits.parquet")
    assert splits.count() == n_total
    groups = spark.read.parquet(str(tmp_path / "groups"))
    k = (
        splits.join(groups, "id")
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert k.where(F.col("k") > 1).count() == 0

    # --report without --docs: histogram only, no singleton bucket row
    rep2 = str(tmp_path / "report2")
    assert job.main(["--checkpoint", ck, "--report", rep2]) == 0
    hist2 = spark.read.parquet(rep2 + "/sizes.parquet")
    assert sorted(r["cluster_size"] for r in hist2.collect()) == [4, 5]


def test_job_cli_emit_corpus(spark, tmp_path):
    """--emit-corpus: the deduplicated end product — one min-id survivor
    per cluster + all singletons, pipeline-processed text, token-budget
    shards, durable manifest."""
    import json as _json

    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=95)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    out = str(tmp_path / "corpus")
    rc = job.main(
        ["--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt"),
         "--tolerance", "0.100", "--output", str(tmp_path / "groups"),
         "--emit-corpus", out, "--shard-tokens", "700"]
    )
    assert rc == 0

    kept = spark.read.parquet(out + "/data")
    groups = spark.read.parquet(str(tmp_path / "groups"))
    n_total = docs.count()
    n_clustered = groups.count()
    n_clusters = groups.select("cluster_id").distinct().count()
    # survivors = one per cluster + all unmatched docs
    assert kept.count() == n_clusters + (n_total - n_clustered)
    # every kept clustered doc is its cluster's min id
    min_ids = {
        r["m"] for r in groups.groupBy("cluster_id").agg(F.min("id").alias("m")).collect()
    }
    kept_ids = {r["url"] for r in kept.select("url").collect()}
    assert min_ids <= kept_ids
    # no kept doc is a non-survivor cluster member
    non_surv = {r["id"] for r in groups.collect()} - min_ids
    assert not (kept_ids & non_surv)

    # shards respect the budget boundary rule (a doc belongs to the shard
    # its running offset starts in) and the manifest is consistent
    man = _json.load(open(out + "/manifest.json"))
    assert man["n_docs"] == kept.count()
    assert man["n_tokens"] == kept.agg(F.sum("n_tokens")).collect()[0][0]
    assert man["n_shards"] == kept.select("shard_id").distinct().count()
    offs = kept.select("shard_id", "shard_offset").collect()
    assert all(r["shard_offset"] // 700 == r["shard_id"] for r in offs)


def test_job_cli_emit_corpus_matchset(spark, tmp_path):
    """--emit-corpus under --grouping matchset: every member is claimed by
    the EARLIEST group containing it (min cluster_id — matchset cluster
    ids are seed ids, so seed-order wins), each doc exported at most once,
    one min-id survivor per claimed group + all singletons."""
    import json as _json

    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=97)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    out = str(tmp_path / "corpus")
    rc = job.main(
        ["--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt"),
         "--tolerance", "0.100", "--grouping", "matchset",
         "--output", str(tmp_path / "groups"),
         "--emit-corpus", out, "--shard-tokens", "700"]
    )
    assert rc == 0

    kept = spark.read.parquet(out + "/data")
    groups = spark.read.parquet(str(tmp_path / "groups"))
    assert "is_seed" in groups.columns  # really matchset-mode output
    # exported at most once, even if groups overlapped
    assert kept.count() == kept.select("url").distinct().count()
    # seed-order claiming: each member's group = min cluster_id over its rows
    claimed = {
        r["id"]: r["c"]
        for r in groups.groupBy("id").agg(F.min("cluster_id").alias("c")).collect()
    }
    want_survivors = {min(m for m, c in claimed.items() if c == cid)
                      for cid in set(claimed.values())}
    all_ids = {r["url"] for r in docs.select("url").collect()}
    want = want_survivors | (all_ids - set(claimed))
    assert {r["url"] for r in kept.select("url").collect()} == want
    man = _json.load(open(out + "/manifest.json"))
    assert man["n_docs"] == len(want)


def test_job_cli_all_stages_composed(spark, tmp_path):
    """Every cluster-preserving stage in ONE run: --extract-html +
    --quality-gate + --decontam + --emit-corpus + groups output, then
    --report over the same checkpoint.  Pins flag interactions (fingerprint
    keys, stage ordering, res.docs threading) that per-flag tests miss.
    --dedup-paragraphs is deliberately absent: first-wins paragraph dedup
    REWRITES near-dup copies (shared lines stripped -> copies shrink out of
    the length band), so on an intra_d-mutated corpus it legitimately
    dissolves the clusters — its semantics are pinned by its own test."""
    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=96)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    raw_path = str(tmp_path / "raw")
    docs.drop("text").write.parquet(raw_path)  # html-only input

    bench_docs = spark.createDataFrame(
        [(900, "benchmark eval question that appears nowhere " * 5)],
        "doc_id long, text string",
    )
    bench_path = str(tmp_path / "bench")
    bench_docs.write.parquet(bench_path)

    ck = str(tmp_path / "ckpt")
    corpus_out = str(tmp_path / "corpus")
    rc = job.main(
        [
            "--docs", raw_path,
            "--checkpoint", ck,
            "--tolerance", "0.100",
            "--extract-html",
            "--quality-gate", "--quality-min-tokens", "10",
            "--decontam", bench_path,
            "--output", str(tmp_path / "groups"),
            "--emit-corpus", corpus_out, "--shard-tokens", "2000",
        ]
    )
    assert rc == 0

    # all stage tables present and ordered by the pipeline
    import os

    for stage in ("docs_extracted", "docs_quality", "docs_decontam",
                  "signatures", "groups"):
        assert os.path.isdir(os.path.join(ck, stage, "data")), stage

    groups = spark.read.parquet(str(tmp_path / "groups"))
    sizes = sorted(r["count"] for r in groups.groupBy("cluster_id").count().collect())
    assert sizes == [4, 5]

    kept = spark.read.parquet(corpus_out + "/data")
    assert kept.count() == 2 + 0  # 2 survivors, no singletons in this corpus
    # emitted text is the PIPELINE-processed text — it must match the LAST
    # preprocessing stage the run produced
    stage_docs = spark.read.parquet(os.path.join(ck, "docs_decontam", "data"))
    j = kept.select("url", F.col("text").alias("emitted")).join(
        stage_docs.select("url", F.col("text").alias("staged")), "url"
    )
    assert j.where(F.col("emitted") != F.col("staged")).count() == 0

    # --report over the same checkpoint composes read-only
    rep = str(tmp_path / "report")
    assert job.main(["--checkpoint", ck, "--report", rep]) == 0
    hist = spark.read.parquet(rep + "/sizes.parquet")
    assert sorted(r["cluster_size"] for r in hist.collect()) == [4, 5]


def test_job_cli_emit_corpus_medoid_rule(spark, tmp_path):
    """--emit-corpus --survivor-rule medoid: same cardinality as min-id
    (one survivor per cluster + singletons), survivors are real members,
    Jaccard mass attached from the signatures stage only for this mode."""
    import json as _json

    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=97)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    out = str(tmp_path / "corpus")
    rc = job.main(
        ["--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt"),
         "--tolerance", "0.100", "--output", str(tmp_path / "groups"),
         "--emit-corpus", out, "--survivor-rule", "medoid"]
    )
    assert rc == 0
    kept = spark.read.parquet(out + "/data")
    groups = spark.read.parquet(str(tmp_path / "groups"))
    n_clusters = groups.select("cluster_id").distinct().count()
    n_singles = docs.count() - groups.count()
    assert kept.count() == n_clusters + n_singles
    # every clustered survivor is a member of some cluster
    members = {r["id"] for r in groups.collect()}
    clustered_kept = {
        r["url"] for r in kept.where(F.col("cluster_size") > 1).collect()
    }
    assert clustered_kept <= members
    man = _json.load(open(out + "/manifest.json"))
    assert man["survivor_rule"].startswith("medoid")


def test_job_cli_emit_corpus_quality_rule(spark, tmp_path):
    """--emit-corpus --survivor-rule quality: per cluster the kept doc is
    the member with the most whitespace tokens in the shipped text (ties
    -> min id); cardinality matches the other rules."""
    import json as _json

    from pyspark.sql import functions as F

    from vid_dup_finder_lib_spark.plans import job

    cb = CorpusBuilder(seed=98)
    cb.make_clusters(
        num_clusters=2, first_size=4, size_step=1, intra_d=20, inter_d=200, doclen=300
    )
    docs = cb.to_spark(spark, partitions=2)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    out = str(tmp_path / "corpus")
    rc = job.main(
        ["--docs", docs_path, "--checkpoint", str(tmp_path / "ckpt"),
         "--tolerance", "0.100", "--output", str(tmp_path / "groups"),
         "--emit-corpus", out, "--survivor-rule", "quality"]
    )
    assert rc == 0
    kept = spark.read.parquet(out + "/data")
    groups = spark.read.parquet(str(tmp_path / "groups"))
    n_clusters = groups.select("cluster_id").distinct().count()
    n_singles = docs.count() - groups.count()
    assert kept.count() == n_clusters + n_singles
    # expected survivor per cluster: max token count, ties -> min id
    toks = {r["url"]: len(r["text"].split()) for r in docs.collect()}
    best: dict = {}
    for r in groups.collect():
        key = (-toks[r["id"]], r["id"])
        if r["cluster_id"] not in best or key < best[r["cluster_id"]][0]:
            best[r["cluster_id"]] = (key, r["id"])
    want_clustered = {v[1] for v in best.values()}
    kept_clustered = {
        r["url"] for r in kept.where(F.col("cluster_size") > 1).collect()
    }
    assert kept_clustered == want_clustered
    man = _json.load(open(out + "/manifest.json"))
    assert man["survivor_rule"].startswith("max processed-token")


def test_emit_corpus_refuses_fold_modes(tmp_path):
    """--emit-corpus with a fold/report mode would be silently ignored
    (those modes return before the emit step) — it must refuse instead."""
    import pytest

    from vid_dup_finder_lib_spark.plans import job

    with pytest.raises(SystemExit):
        job.main(
            ["--checkpoint", str(tmp_path / "ck"), "--report",
             str(tmp_path / "rep"), "--emit-corpus", str(tmp_path / "out")]
        )
