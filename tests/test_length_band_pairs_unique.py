"""r6 optimization: length_band_pairs dropped its distinct() — prove each
qualifying pair is emitted EXACTLY once and the pair set equals the brute
force O(n^2) window."""

from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.operators.verify import length_band_pairs


def test_no_duplicates_and_equals_bruteforce(spark):
    cfg = SigConfig(lsh_bands=64)
    # doc lengths spanning several log-bands incl. exact boundary ratios
    lens = [5, 10, 11, 12, 20, 22, 40, 44, 45, 100, 110, 111, 400, 440]
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(n))) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    sigs = build_signatures(docs, cfg, id_col="doc_id", text_col="text")
    out = length_band_pairs(sigs, cfg)
    rows = out.collect()
    pairs = [(r.id1, r.id2) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate pair rows emitted"
    ratio = int(round(cfg.self_len_ratio * 100))
    want = {
        (i, j)
        for i in range(len(lens))
        for j in range(i + 1, len(lens))
        if max(lens[i], lens[j]) * 100 <= min(lens[i], lens[j]) * ratio
    }
    assert set(pairs) == want
