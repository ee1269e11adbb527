"""Capture .explain('formatted') for declared queries into plans/r06/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
hot set).  Guide §1: plan shape (Exchange count, join strategy,
PushedFilters, Python-eval nodes) is the evidence optimization claims are
checked against.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HOT = [
    "signatures_basic",
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "connected_components",
    "simhash_pairs",
    "length_band_pairs",
    "refs_search",
    "ann_topk",
    "substring_pairs",
    "char_ngram_pairs",
    "char_lsh_pairs",
    "threshold_sweep_cc",
    "merge_many_cc",
    "clustering_agreement",
    "ivf_topk",
    "split_leakage",
    "pair_lcs",
    "semantic_dedup",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from vid_dup_finder_lib_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = qs[name](spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
