"""Stage-isolation bench (guide §1.4): times each stage of the shared
signature -> LSH -> verify -> CC chain with noop sinks, plus the CC loop
alone, so optimization work targets measured cost, not guesses.

NOT part of the driver contract — bench.py is frozen; numbers here feed
OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from vid_dup_finder_lib_spark.operators.components import connected_components
    from vid_dup_finder_lib_spark.operators.grouping import cc_groups
    from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
    from vid_dup_finder_lib_spark.operators.signatures import build_signatures
    from vid_dup_finder_lib_spark.operators.verify import verified_edges
    from vid_dup_finder_lib_spark.session import get_spark

    spark = get_spark(app_name="bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict[str, float] = {}

    for trial in range(2):
        t: dict[str, float] = {}

        sc.setJobDescription("stage: derived corpus")
        derived = entry._derived_neardup(entry._docs(spark, sf_dir))
        t["derived_noop"] = noop(derived)

        sc.setJobDescription("stage: signatures (kernel)")
        t0 = time.time()
        sigs = build_signatures(
            derived, entry.ENTRY_CFG, id_col="doc_id", text_col="text"
        ).localCheckpoint(eager=True)
        t["signatures_ckpt"] = round(time.time() - t0, 3)

        sc.setJobDescription("stage: candidate_pairs (LSH)")
        t0 = time.time()
        pairs, _q = candidate_pairs(sigs, entry.ENTRY_CFG)
        t["lsh_build"] = round(time.time() - t0, 3)
        t["lsh_noop"] = noop(pairs)

        sc.setJobDescription("stage: verify")
        edges = verified_edges(
            pairs, sigs, entry.ENTRY_CFG,
            jaccard_num_den=(entry.JACCARD_NUM, entry.JACCARD_DEN),
            length_band=False,
        )
        t["verify_noop"] = noop(edges)

        sc.setJobDescription("stage: edges ckpt + cc")
        t0 = time.time()
        edges_m = edges.localCheckpoint(eager=True)
        t["edges_ckpt"] = round(time.time() - t0, 3)
        t0 = time.time()
        cc = connected_components(edges_m)
        t["cc_build"] = round(time.time() - t0, 3)
        t["cc_noop"] = noop(cc)

        sc.setJobDescription(None)
        print(f"# trial {trial}: {json.dumps(t)}", file=sys.stderr)
        for k, v in t.items():
            out[k] = min(out.get(k, 1e9), v)

    print(json.dumps({"stages_min": out, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
