"""compression_ratio_permille: semantics + fixture staleness guard."""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions.textstats import compression_ratio_permille

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ratio_orders_text_classes(spark):
    import random

    rng = random.Random(3)
    repetitive = "the same line again and again " * 200
    human_ish = " ".join(
        rng.choice(["alpha", "bravo", "charlie", "delta", "echo", "fox"])
        + str(rng.randint(0, 999))
        for _ in range(600)
    )
    noise = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(4000))
    df = spark.createDataFrame(
        [(1, repetitive), (2, human_ish), (3, noise), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", compression_ratio_permille(F.col("text")).alias("r")
        ).collect()
    }
    # repetition compresses hard; noise barely; human-ish in between
    assert got[1] < 100
    assert got[1] < got[2] < got[3]
    assert got[3] > 700
    assert got[4] is None


def test_fixture_not_stale(spark):
    """Engine output over sf0.001 must equal the committed fixture — a
    drift in encoding/level/permille math fails here, never silently."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_zlib_fixture as mk

    sf = "/root/testdata/sf0.001"
    fresh = mk.expected(sf)
    committed = pq.read_table(
        os.path.join(REPO, "fixtures", "compression_ratio_sf0.001.parquet")
    )
    assert fresh.equals(committed), "fixture stale: regenerate make_zlib_fixture"

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    engine = {
        r["doc_id"]: r["r"]
        for r in docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            compression_ratio_permille(F.col("text")).alias("r"),
        ).collect()
    }
    exp = dict(
        zip(committed["doc_id"].to_pylist(), committed["ratio_permille"].to_pylist())
    )
    assert engine == exp
