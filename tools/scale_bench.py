"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands >=0.8 throughput scaling efficiency between N and 4N
executors.  No real cluster exists in this sandbox, so per the task
directive the same job runs at two parallelism levels — local[8] and
local[32] — on the same input, and efficiency is

    eff = (T_N / T_4N) / 4        (1.0 = perfect linear scaling)

Workload: the end-to-end dedup pipeline (signatures -> LSH bands -> verify ->
connected components) over an amplified corpus derived deterministically from
the sf documents table (each doc + AMPLIFY variants, each variant a distinct
token-substitution pattern, so clusters of AMPLIFY+1 near-dups are planted
throughout).  JVM/session startup and input materialization are excluded —
they are fixed costs that do not exist per-stage at cluster scale.

Run:  python tools/scale_bench.py [sf_dir] [out_md]
Each parallelism level runs in its own subprocess (one JVM cannot change
local[N] after start).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

AMPLIFY = 15
CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
from pyspark.sql import functions as F
from vid_dup_finder_lib_spark.session import get_spark
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.text import normalize_text, tokens_col
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
from vid_dup_finder_lib_spark.operators.verify import verified_edges
from vid_dup_finder_lib_spark.operators.components import connected_components

AMPLIFY = %(amplify)d
cfg = SigConfig(num_perms=128, lsh_bands=32, seed=42)
spark = get_spark(app_name=f"scale-{cpus}", cpus=cpus, shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
tok = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                  tokens_col(normalize_text(F.col("text"))).alias("toks"))
variants = tok.select(
    "doc_id",
    F.explode(F.sequence(F.lit(0), F.lit(AMPLIFY))).alias("v"),
    "toks",
).select(
    (F.col("doc_id") * 100 + F.col("v")).alias("doc_id"),
    F.array_join(
        F.transform(
            "toks",
            lambda x, i: F.when(
                (F.col("v") > 0) & (i %% 13 == F.col("v") %% 13), F.concat(F.lit("v"), F.col("v").cast("string"))
            ).otherwise(x),
        ),
        " ",
    ).alias("text"),
)
corpus = variants.repartition(cpus * 2).localCheckpoint(eager=True)
n_docs = corpus.count()

t0 = time.time()
sigs = build_signatures(corpus, cfg, id_col="doc_id", text_col="text").localCheckpoint(eager=True)
pairs, _q = candidate_pairs(sigs, cfg)
edges = verified_edges(pairs, sigs, cfg, jaccard_num_den=(7, 10), length_band=True).localCheckpoint(eager=True)
n_edges = edges.count()
cc = connected_components(edges)
n_assigned = cc.count()
wall = time.time() - t0
print(json.dumps({"cpus": cpus, "docs": n_docs, "edges": n_edges,
                  "assigned": n_assigned, "wall_sec": round(wall, 2),
                  "docs_per_sec": round(n_docs / wall, 1)}))
spark.stop()
"""


def run_level(cpus: int, sf_dir: str) -> dict:
    script = CHILD % {"amplify": AMPLIFY}
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), sf_dir],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"child failed at cpus={cpus}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH.md"
    results = [run_level(c, sf_dir) for c in (8, 32)]
    r8, r32 = results
    assert r8["edges"] == r32["edges"] and r8["docs"] == r32["docs"], "nondeterministic job!"
    speedup = r8["wall_sec"] / r32["wall_sec"]
    eff = speedup / 4
    lines = [
        "# BENCH — scaling evidence (N vs 4N parallelism)",
        "",
        "North-rule scaling criterion evidenced in-sandbox as local[8] vs",
        "local[32] on identical input (no real cluster available); same job,",
        "byte-identical output (edge/doc counts asserted equal).",
        "",
        f"- workload: dedup pipeline (signatures → LSH(32×4) → exact-Jaccard",
        f"  verify ≥0.7 → CC) over {r8['docs']} docs derived from {sf_dir}",
        f"  ({AMPLIFY}+1 planted variants per base doc), {r8['edges']} verified edges",
        "",
        "| parallelism | wall (s) | docs/sec |",
        "|---|---|---|",
        f"| local[8]  (N)  | {r8['wall_sec']} | {r8['docs_per_sec']} |",
        f"| local[32] (4N) | {r32['wall_sec']} | {r32['docs_per_sec']} |",
        "",
        f"- speedup 8→32: **{speedup:.2f}×**",
        f"- scaling efficiency (speedup/4): **{eff:.3f}** (target ≥ 0.8)",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"speedup": round(speedup, 2), "efficiency": round(eff, 3),
                      "r8": r8, "r32": r32}))


if __name__ == "__main__":
    main()
