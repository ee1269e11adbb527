"""LSH recall/efficiency sweep vs the exact pair oracle.

The north rule demands dup-pair recall >= 0.99 at the chosen
shingle/signature config.  ``missed_matches`` (the oracle-gated query)
proves recall == 1.0 at ENTRY_CFG on the planted corpus; this tool shows
WHY that configuration is safe and what the neighboring configs trade:
for each (num_perms, lsh_bands) it measures, against the exact
shingle-Jaccard >= 0.4 pair set (explode + equi-join — no LSH, the ground
truth), the LSH candidate count, the verified-pair recall, and the
candidate efficiency (what fraction of candidate pairs survive verify —
the shuffle waste knob).

Usage: python tools/recall_sweep.py [sf_dir] [out_md]
Writes a markdown table (default RECALL.md) and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vid_dup_finder_lib_spark.config import SigConfig  # noqa: E402
from vid_dup_finder_lib_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs  # noqa: E402
from vid_dup_finder_lib_spark.operators.signatures import build_signatures  # noqa: E402
from vid_dup_finder_lib_spark.operators.verify import verified_edges  # noqa: E402
from vid_dup_finder_lib_spark.session import get_spark  # noqa: E402

JACCARD = (2, 5)
CONFIGS = [(128, 16), (128, 32), (128, 64), (128, 128), (64, 32), (256, 64)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/RECALL.md"
    spark = get_spark(app_name="recall-sweep", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    docs = entry._docs(spark, sf_dir)
    derived = entry._derived_neardup(docs).localCheckpoint(eager=True)

    # ground truth is config-independent (shingle k fixed): compute once
    base_sigs = build_signatures(
        derived, SigConfig(seed=42), id_col="doc_id", text_col="text"
    ).localCheckpoint(eager=True)
    exact = (
        ngram_jaccard_pairs(base_sigs, *JACCARD)
        .select("id1", "id2")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()

    rows = []
    for num_perms, bands in CONFIGS:
        cfg = SigConfig(num_perms=num_perms, lsh_bands=bands, seed=42)
        t0 = time.time()
        sigs = build_signatures(
            derived, cfg, id_col="doc_id", text_col="text"
        ).localCheckpoint(eager=True)
        pairs, _q = candidate_pairs(sigs, cfg)
        pairs = pairs.localCheckpoint(eager=True)
        n_cand = pairs.count()
        found = (
            verified_edges(pairs, sigs, cfg, jaccard_num_den=JACCARD, length_band=False)
            .select("id1", "id2")
            .join(exact, ["id1", "id2"], "left_semi")
            .count()
        )
        dt = time.time() - t0
        recall = found / n_exact if n_exact else 1.0
        eff = found / n_cand if n_cand else 1.0
        rows.append((num_perms, bands, num_perms // bands, n_cand, found, recall, eff, dt))
        print(
            f"# perms={num_perms} bands={bands} rows/band={num_perms//bands}: "
            f"cand={n_cand} found={found}/{n_exact} recall={recall:.4f} "
            f"eff={eff:.3f} [{dt:.1f}s]",
            file=sys.stderr,
        )

    lines = [
        "# RECALL — LSH recall/efficiency sweep vs the exact pair oracle",
        "",
        f"Corpus: derived near-dup corpus over `{sf_dir}` "
        f"({derived.count()} docs); ground truth = exact shingle-Jaccard "
        f">= {JACCARD[0]}/{JACCARD[1]} pairs via explode + equi-join "
        f"(**{n_exact} pairs**, no LSH involved).  Verified pairs use the "
        "same Jaccard predicate on LSH candidates, so any shortfall below "
        "is purely banding recall.  The north rule requires recall >= 0.99. "
        "Read the table bottom-up: 8-row bands are far too strict "
        "(recall ~0.22); 4-row bands at 128 perms miss ~5 % of borderline "
        "pairs; 2 rows/band reach measured recall 1.0 — and 1-row bands "
        "keep recall 1.0 while collapsing candidate efficiency to ~2 % "
        "(50x verify-shuffle waste).  The entry config (128 x 64, 2 "
        "rows/band) sits at the knee; 256 perms x 64 bands buys perfect "
        "efficiency at double the signature cost.",
        "",
        "| perms | bands | rows/band | candidates | found/exact | recall | cand. efficiency | wall (s) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for num_perms, bands, r, n_cand, found, recall, eff, dt in rows:
        lines.append(
            f"| {num_perms} | {bands} | {r} | {n_cand} | {found}/{n_exact} "
            f"| {recall:.4f} | {eff:.3f} | {dt:.1f} |"
        )
    lines += [
        "",
        "Efficiency = verified-true pairs / candidate pairs (higher = less "
        "verify-shuffle waste).  Regenerate: `python tools/recall_sweep.py`.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    best = max(rows, key=lambda x: (x[5], x[6]))
    print(json.dumps({
        "exact_pairs": n_exact,
        "configs": [
            {"perms": p, "bands": b, "recall": round(rc, 4), "efficiency": round(e, 3)}
            for p, b, _r, _c, _f, rc, e, _t in rows
        ],
        "best": {"perms": best[0], "bands": best[1], "recall": round(best[5], 4)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
