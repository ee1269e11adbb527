"""Benchmark decontamination: flag training docs sharing verbatim n-grams
with an evaluation corpus.

The standard training-data hygiene step (GPT-3 appendix-C style 13-gram
decontamination, public knowledge): any training document containing a
verbatim n-gram that also appears in a benchmark/eval document is
contaminated — training on it inflates eval scores.  The reference's
closest analog is the falsepos/confirmed match-DB filtering (matchdb.rs):
an external curated set changes what the pipeline keeps.

Scale shape:

* both sides reduce to DISTINCT per-doc n-gram md5 hashes
  (``shingles_col`` + md5 — pure codegen, cross-engine-reproducible like
  ``doc_fingerprint``);
* eval corpora are tiny relative to training corpora (thousands vs 10^12
  docs), so the benchmark hash set is **broadcast** — the training side
  streams map-side through the join, NO shuffle of training data;
* output is per-doc: matched-distinct-ngram count + flag.  Counting needs
  a groupBy on doc_id only over the MATCHED rows (post-broadcast-join
  survivors — a tiny fraction), not the full explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.functions.text import normalize_text, shingles_col, tokens_col


def ngram_hashes(docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ngram_md5) — distinct per doc, exploded.  Docs shorter than n
    tokens contribute no rows (they cannot contain a verbatim n-gram)."""
    sh = shingles_col(tokens_col(normalize_text(F.col(text_col))), n)
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(sh).alias("ng"))
        .select("id", F.md5("ng").alias("ngram_md5"))
    )


def benchmark_contamination(
    training: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_benchmark_ngrams: int = 50_000_000,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-training-doc contamination report: ``(id_col,
    n_contaminated_ngrams, contaminated)``.  Every training doc appears in
    the output (clean docs with 0/false) — a report that silently omitted
    clean docs would make "not checked" indistinguishable from "clean".

    ``n_contaminated_ngrams`` counts DISTINCT training-side n-grams that
    appear anywhere in the benchmark corpus (per-doc distinct via
    shingles_col; the same n-gram appearing in several benchmark docs
    counts once — the benchmark side is deduplicated before the join so
    the semi-join multiplicity cannot inflate counts).

    ``max_benchmark_ngrams``: fail-fast valve on the broadcast side.  The
    design assumes eval corpora are tiny relative to training corpora; a
    benchmark whose distinct n-gram set exceeds the cap would OOM the
    broadcast on every executor — RAISE (with the count) instead, and the
    caller can shrink the benchmark or fall back to a shuffled join.  The
    check is one aggregation over the SMALL side only.
    """
    train_ng = ngram_hashes(training, n, id_col, text_col)
    bench_ng = (
        ngram_hashes(
            benchmark,
            n,
            bench_id_col if bench_id_col is not None else id_col,
            bench_text_col if bench_text_col is not None else text_col,
        )
        .select("ngram_md5")
        .distinct()
        .localCheckpoint(eager=True)  # consumed by the count AND the join
    )
    n_bench = bench_ng.count()
    if n_bench > max_benchmark_ngrams:
        raise ValueError(
            f"benchmark_contamination: benchmark side has {n_bench} distinct "
            f"{n}-grams (> max_benchmark_ngrams={max_benchmark_ngrams}) — too "
            "large to broadcast; shrink the benchmark or raise the cap and "
            "use a shuffled join"
        )
    matched = (
        train_ng.join(F.broadcast(bench_ng), "ngram_md5")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    ids = training.select(F.col(id_col).alias("id"))
    return (
        ids.join(matched, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("long").alias(
                "n_contaminated_ngrams"
            ),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def eval_coverage(
    training: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_benchmark_ngrams: int = 50_000_000,
) -> DataFrame:
    """Per-EVAL-doc contamination coverage — the reverse view of
    :func:`benchmark_contamination`: for each benchmark doc, how many of
    its distinct n-grams appear anywhere in the training corpus, plus a
    cross-multiplied >1/2 ``compromised`` flag.  Decontamination tells you
    which TRAINING docs to drop; this tells you which EVAL items are
    already burned and how badly — the number an eval-integrity report
    needs before trusting a score.

    Output: ``(id_col, n_ngrams, n_covered, compromised)``; benchmark docs
    shorter than ``n`` tokens report 0/0/false (nothing to cover).

    Scale shape mirrors benchmark_contamination exactly: the benchmark
    n-gram set (valve-guarded, tiny) is broadcast, the 10^12-doc training
    side streams map-side through the semi-join, and only the MATCHED
    hashes — a subset of the small side — are distinct'd and shuffled.
    The per-doc coverage join is again broadcast (hit set ⊆ benchmark
    set).
    """
    bench_doc_ng = ngram_hashes(benchmark, n, id_col, text_col).localCheckpoint(
        eager=True
    )
    bench_set = bench_doc_ng.select("ngram_md5").distinct().localCheckpoint(eager=True)
    n_bench = bench_set.count()
    if n_bench > max_benchmark_ngrams:
        raise ValueError(
            f"eval_coverage: benchmark side has {n_bench} distinct {n}-grams "
            f"(> max_benchmark_ngrams={max_benchmark_ngrams}) — too large to "
            "broadcast; shrink the benchmark or raise the cap"
        )
    train_ng = ngram_hashes(training, n, id_col, text_col)
    hit = (
        train_ng.join(F.broadcast(bench_set), "ngram_md5")
        .select("ngram_md5")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    per_doc = (
        bench_doc_ng.join(F.broadcast(hit), "ngram_md5", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("_hit"), 1).otherwise(0)).cast("long").alias("n_covered"),
        )
    )
    ids = benchmark.select(F.col(id_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
        F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
        (
            F.coalesce("n_covered", F.lit(0)) * 2 > F.coalesce("n_ngrams", F.lit(0))
        ).alias("compromised"),
    )
