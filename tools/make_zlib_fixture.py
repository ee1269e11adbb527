"""Compression-ratio oracle fixture generator.

``compression_ratio`` is zlib-dependent (no ANSI-SQL twin exists — DuckDB
exposes no deflate), so like the simhash/ahash families it is gated by a
committed parquet fixture computed by a Spark-free twin.  zlib itself
cannot be "independently reimplemented" (RFC 1950 output for a fixed level
IS the contract); what the fixture pins is everything around it — the
UTF-8 encoding step, the permille integer arithmetic, the null rule, and
the frozen ``level=6`` — so an engine-side drift in any of those fails the
gate instead of silently changing every downstream quality decision.

Usage: python tools/make_zlib_fixture.py [sf_dir ...]
Writes fixtures/compression_ratio_<sfname>.parquet for each input dir.
"""

from __future__ import annotations

import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

LEVEL = 6  # frozen contract — matches functions/textstats.compression_ratio_permille


def expected(sf_dir: str) -> pa.Table:
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids, ratios = [], []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        ids.append(doc_id)
        if text is None:
            ratios.append(None)
        else:
            b = text.encode("utf-8")
            ratios.append(len(zlib.compress(b, LEVEL)) * 1000 // max(len(b), 1))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "ratio_permille": pa.array(ratios, pa.int64()),
        }
    )


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    for d in dirs:
        name = os.path.basename(d.rstrip("/"))
        out = os.path.join(repo, "fixtures", f"compression_ratio_{name}.parquet")
        pq.write_table(expected(d), out)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
