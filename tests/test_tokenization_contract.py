"""Three-engine tokenization contract (ADVICE r1, vertical tab).

normalize_text (Java regex), the Arrow kernel (RE2 via pyarrow), and the
DuckDB oracle (RE2) must agree byte-for-byte on the whitespace class
``[ \\t\\n\\r\\f\\x0B]`` — and, just as importantly, must all AGREE on what
is NOT whitespace (NBSP, unicode spaces): the engines' ``\\s`` differ there,
which is why the class is spelled out explicitly in all three.
"""

import duckdb
import pyspark.sql.functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.text import normalize_text, tokens_col
from vid_dup_finder_lib_spark.operators.signatures import build_signatures

NASTY = [
    ("ascii_ws", "a\tb\nc\rd\fe\x0bf  g"),
    ("vtab_only", "hello\x0bworld"),
    ("leading_trailing", " \t\n hello world \x0b\r "),
    ("nbsp_preserved", "a b c"),          # NBSP is NOT whitespace here
    ("unicode_spaces", "a b​c d"),   # em-space / ZWSP preserved
    ("empty", ""),
    ("only_ws", " \t\x0b\n "),
    ("case_fold", "HeLLo WORLD"),
    ("emoji", "🦀 tokens 🦀 stay"),
]


def test_three_engines_agree(spark):
    rows = [(name, text) for name, text in NASTY]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    # engine 1: JVM codegen path
    jvm = {
        r.doc_id: (r.norm, list(r.toks))
        for r in docs.select(
            "doc_id",
            normalize_text(F.col("text")).alias("norm"),
            tokens_col(normalize_text(F.col("text"))).alias("toks"),
        ).collect()
    }

    # engine 2: Arrow kernel (observable via doclen = token count)
    kern = {
        r.id: r.doclen
        for r in build_signatures(
            docs, SigConfig(), id_col="doc_id", text_col="text"
        ).collect()
    }

    # engine 3: DuckDB oracle expression (verbatim from __spark_entry__)
    con = duckdb.connect()
    duck = {}
    for name, text in rows:
        norm, = con.execute(
            r"SELECT lower(trim(regexp_replace(?, '[ \t\n\r\f\x0B]+', ' ', 'g')))",
            [text],
        ).fetchone()
        duck[name] = (norm, norm.split(" ") if norm else [])

    for name, _ in rows:
        assert jvm[name][0] == duck[name][0], f"{name}: norm mismatch"
        assert jvm[name][1] == duck[name][1], f"{name}: tokens mismatch"
        assert kern[name] == len(jvm[name][1]), f"{name}: kernel token count"

    # the discriminating cases: \x0b IS collapsed, NBSP/unicode spaces are NOT
    assert jvm["vtab_only"][1] == ["hello", "world"]
    assert jvm["nbsp_preserved"][1] == ["a b", "c"]
    assert jvm["unicode_spaces"][1] == ["a b​c", "d"]
    assert jvm["only_ws"][1] == []
