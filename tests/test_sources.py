"""Docs sources (S1 analog): JSONL round-trip preserves the byte invariant;
prefix filters reach the parquet scan as pushed predicates."""

from vid_dup_finder_lib_spark.corpus import CorpusBuilder
from vid_dup_finder_lib_spark.sources.docs import read_docs, write_docs_jsonl


def test_jsonl_roundtrip_and_prefix_pushdown(spark, tmp_path):
    cb = CorpusBuilder(seed=61)
    cb.add_singletons(20, 100, 200, site=1)
    cb.add_singletons(10, 100, 200, site=2)
    docs = cb.to_spark(spark).localCheckpoint()

    # JSONL round-trip: html (binary via base64), text, timestamps identical
    write_docs_jsonl(docs, str(tmp_path / "jl"))
    back = read_docs(spark, str(tmp_path / "jl"), fmt="jsonl")
    assert back.count() == 30
    mism = (
        back.alias("b")
        .join(docs.alias("o"), "url")
        .where(
            "b.html <> o.html OR b.text <> o.text OR b.warc_ts <> o.warc_ts "
            "OR b.lang <> o.lang"
        )
        .count()
    )
    assert mism == 0

    urls = sorted(r.url for r in docs.select("url").collect())
    site1_prefix = urls[0][: len("https://siteXXXXX")]
    n_site1 = sum(1 for u in urls if u.startswith(site1_prefix))

    filt = read_docs(
        spark, str(tmp_path / "jl"), fmt="jsonl", include_prefixes=[site1_prefix]
    )
    assert filt.count() == n_site1

    # parquet: the include/exclude predicates are PUSHED into the scan
    docs.write.parquet(str(tmp_path / "pq"))
    pq = read_docs(
        spark,
        str(tmp_path / "pq"),
        include_prefixes=[site1_prefix],
        exclude_prefixes=[site1_prefix + ".nonexistent"],
    )
    assert pq.count() == n_site1
    plan = pq._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "StartsWith" in plan
