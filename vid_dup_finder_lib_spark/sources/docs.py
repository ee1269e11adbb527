"""Document-corpus sources: the S1 filesystem-walk analog as table scans.

The reference enumerates its corpus with a parallel directory walk plus
include/exclude prefix and extension filters applied *during* the walk
(``filename_pattern.rs:89-143``) so excluded items are never decoded.  The
Spark-native equivalent: declarative scans over the canonical docs schema
with the same predicates expressed as Catalyst filters, so pushdown does the
walk-time skipping (parquet: min/max + dictionary pruning on ``url``; for
partitioned layouts, partition pruning).

Formats:

* ``parquet`` — the native layout (binary ``html`` rides as-is);
* ``jsonl`` — newline-delimited JSON, the Common-Crawl-adjacent interchange
  shape; JSON has no binary type, so ``html`` travels base64-encoded in an
  ``html_b64`` field and is decoded (``F.unbase64``) at read time.  The
  writer/reader pair round-trips byte-identically (tested), preserving the
  per-row invariant text == extract(html).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.filters import url_pattern_filter

# the canonical docs shape fixed by BASELINE.json input_hint
DOCS_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
_JSONL_DDL = "url string, warc_ts timestamp, html_b64 string, text string, lang string"


def read_docs(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    include_prefixes: list[str] | None = None,
    exclude_prefixes: list[str] | None = None,
) -> DataFrame:
    """Scan a docs corpus into the canonical schema, with the reference's
    include/exclude prefix filters (F1/F2) expressed as scan predicates."""
    if fmt == "parquet":
        df = spark.read.schema(DOCS_DDL).parquet(path)
    elif fmt == "jsonl":
        raw = spark.read.schema(_JSONL_DDL).json(path)
        df = raw.select(
            "url",
            "warc_ts",
            F.unbase64("html_b64").alias("html"),
            "text",
            "lang",
        )
    else:
        raise ValueError(f"unknown docs format {fmt!r} (parquet|jsonl)")
    if include_prefixes or exclude_prefixes:
        df = df.where(
            url_pattern_filter(
                F.col("url"),
                include_prefixes=include_prefixes,
                exclude_prefixes=exclude_prefixes,
            )
        )
    return df


def write_docs_jsonl(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write the canonical docs frame as newline-delimited JSON (html as
    base64) — the interchange sink matching read_docs(fmt='jsonl')."""
    (
        docs.select(
            "url",
            "warc_ts",
            F.base64("html").alias("html_b64"),
            "text",
            "lang",
        )
        .write.mode(mode)
        .json(path)
    )
