"""Cross-query invariants the per-query oracles cannot see: independent
entry queries must agree with each other on shared quantities."""

SF = "/root/testdata/sf0.001"


def test_redundancy_report_matches_survivors(spark):
    import __spark_entry__ as e

    report = e.queries()["corpus_redundancy_report"](spark, SF).first()
    n_survivors = e.queries()["neardup_survivors"](spark, SF).count()
    assert report["n_surviving_docs"] == n_survivors
    n_cc_rows = e.queries()["connected_components"](spark, SF).count()
    assert (
        report["n_neardup_redundant"]
        == n_cc_rows - report["n_neardup_clusters"]
    )
