"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash (columns sorted
by name, rows sorted, values stringified).  Exit 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(val) -> str:
    if val is None:
        return "\0NULL"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        return repr(round(val, 9))
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from vid_dup_finder_lib_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(srows):6d} (rows-only, no oracle) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        # fixture oracles pin the driver's sf0.01 fixture path; when run
        # against another sf dir, swap in that dir's fixture if it exists
        # (otherwise a sf0.001 run compares against the WRONG fixture and
        # reports a false FAIL)
        sql = oracles[name]
        sfname = os.path.basename(os.path.normpath(sf_dir))
        if sfname != "sf0.01" and "_sf0.01.parquet" in sql:
            cand = sql.replace("_sf0.01.parquet", f"_{sfname}.parquet")
            fix = re.search(r"'(/[^']*_%s\.parquet)'" % re.escape(sfname), cand)
            if fix and os.path.exists(fix.group(1)):
                sql = cand
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = value_hash(scols, srows)
        oh = value_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"  {name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"hash={'=' if ok_hash else f'{sh} vs {oh}'} "
            f"[spark {t_spark:.1f}s, duck {t_duck:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            srt = sorted(srows)[:3]
            ort = sorted(orows)[:3]
            print(f"    spark sample: {srt}")
            print(f"    duck  sample: {ort}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
