"""paragraph_neardup_pairs: sub-document fuzzy dedup semantics."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.dedup import paragraph_neardup_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _para(words, n=40):
    return " ".join(words[i % len(words)] + str(i) for i in range(n))


def test_edited_paragraph_reuse_detected(spark):
    # doc 1 para 1 reused in doc 2 para 0 with 4 of 40 tokens swapped
    shared = _para(["alpha", "beta", "gamma"])
    toks = shared.split()
    edited = list(toks)
    for p in (5, 15, 25, 35):
        edited[p] = "zz"
    other1 = _para(["uno", "dos", "tres"])
    other2 = _para(["un", "deux", "trois"])
    docs = _docs(
        spark,
        [
            (1, other1 + " " + shared),
            (2, " ".join(edited) + " " + other2),
        ],
    )
    rows = paragraph_neardup_pairs(docs, 2, 5, para_tokens=40).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id1"], r["para1"], r["id2"], r["para2"]) == (1, 1, 2, 0)
    # 4 mutations in 40 tokens -> inter/union well above 2/5
    assert r["inter_count"] * 5 >= r["union_count"] * 2


def test_intra_doc_repetition_excluded(spark):
    # the same paragraph twice INSIDE one doc: no pair (cross-doc only)
    p = _para(["rep", "eat"])
    docs = _docs(spark, [(1, p + " " + p)])
    assert paragraph_neardup_pairs(docs, 2, 5, para_tokens=40).count() == 0


def test_unrelated_paragraphs_no_pairs(spark):
    docs = _docs(spark, [(1, _para(["aa", "bb"])), (2, _para(["cc", "dd"]))])
    assert paragraph_neardup_pairs(docs, 2, 5, para_tokens=40).count() == 0


def test_short_paragraph_tail_excluded(spark):
    # a 2-token tail paragraph carries no 3-shingles -> never pairs
    docs = _docs(spark, [(1, "x y"), (2, "x y")])
    assert paragraph_neardup_pairs(docs, 2, 5, para_tokens=40).count() == 0


def test_shingle_df_valve_drops_hot_shingles(spark):
    # a shingle shared by everything is droppable via max_shingle_df;
    # identical paragraphs then lose that shingle from BOTH sides equally
    p = _para(["hot", "stop"])
    docs = _docs(spark, [(i, p) for i in range(1, 5)])
    exact = paragraph_neardup_pairs(docs, 2, 5, para_tokens=40)
    assert exact.count() == 6  # C(4,2) identical paragraph pairs
    capped = paragraph_neardup_pairs(docs, 2, 5, para_tokens=40, max_shingle_df=3)
    # every shingle has df 4 > 3 -> all dropped -> no rows survive sc>0
    assert capped.count() == 0
