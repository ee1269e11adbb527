"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 over
the driver-provided testdata tables; ``oracle_sql()`` carries the equivalent
DuckDB SQL.  Design rule: every oracle-checked output is integer/string-exact
(intersection+union counts, md5 hex, ranks) — no floats — so Spark and DuckDB
hash-match bit-for-bit.

Dedup queries run over a *derived corpus* built identically in both engines
from the ``documents`` table: base docs ∪ mutated copies (doc_id+100000,
every 10th token replaced by 'zz' — planted near-dups at Jaccard ≈ 0.54) ∪,
for the exact-dup query, verbatim copies (doc_id+200000).  This makes the
near-dup queries non-trivially non-empty with known ground truth.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.functions.text import normalize_text, tokens_col
from vid_dup_finder_lib_spark.functions.textstats import (
    STOPWORDS,
    bpe_ish_token_count,
    doc_fingerprint,
    langid_heuristic,
    quality_score_components,
    stopword_hits,
    whitespace_token_count,
)
from vid_dup_finder_lib_spark.operators.dedup import ngram_jaccard_pairs
from vid_dup_finder_lib_spark.operators.lsh import candidate_pairs
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.operators.verify import verified_edges

# LSH config for the oracle-checked near-dup queries: 64 bands x 2 rows gives
# candidate recall 1-(1-J^2)^64 >= 0.99998 at the J=0.4 verify threshold, so
# the LSH+verify output equals the exact-Jaccard oracle with near certainty.
ENTRY_CFG = SigConfig(num_perms=128, lsh_bands=64, seed=42)

JACCARD_NUM, JACCARD_DEN = 2, 5  # threshold 0.4, applied as exact integers


# ---------------------------------------------------------------------------
# shared Spark-side builders
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col(normalize_text(F.col("text"))).alias("toks"),
    )


def _derived_neardup(docs: DataFrame) -> DataFrame:
    """base ∪ mutated copies (+100000): every 10th token (0-based) -> 'zz'."""
    tok = _tokens(docs)
    mutated = tok.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.transform(
            F.col("toks"),
            lambda x, i: F.when(i % 10 == 0, F.lit("zz")).otherwise(x),
        ).alias("toks"),
    )
    return (
        tok.unionByName(mutated)
        .select("doc_id", F.array_join("toks", " ").alias("text"))
    )


def _derived_exact(docs: DataFrame) -> DataFrame:
    """base ∪ verbatim copies (+200000)."""
    tok = _tokens(docs)
    copies = tok.select((F.col("doc_id") + 200000).alias("doc_id"), "toks")
    return tok.unionByName(copies).select(
        "doc_id", F.array_join("toks", " ").alias("text")
    )


def _neardup_signatures(docs: DataFrame) -> DataFrame:
    return build_signatures(
        _derived_neardup(docs), ENTRY_CFG, id_col="doc_id", text_col="text"
    )


# ---------------------------------------------------------------------------
# shared oracle SQL fragments (DuckDB dialect)
# ---------------------------------------------------------------------------

_SQL_PROLOGUE = r"""
WITH norm AS (
  SELECT doc_id::BIGINT AS doc_id,
         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
  FROM documents
),
tok AS (
  SELECT doc_id,
         CASE WHEN norm = '' THEN []::VARCHAR[] ELSE string_split(norm, ' ') END AS toks
  FROM norm
),
derived AS (
  SELECT doc_id, toks FROM tok
  UNION ALL
  SELECT doc_id + 100000,
         list_transform(toks, (x, i) -> CASE WHEN (i-1) % 10 = 0 THEN 'zz' ELSE x END)
  FROM tok
),
dsh AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE []::VARCHAR[] END AS shingles
  FROM derived
),
ex AS (
  SELECT doc_id, len(shingles)::BIGINT AS sc, unnest(shingles) AS shg
  FROM dsh WHERE len(shingles) > 0
),
rawpairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, a.sc AS sc1, b.sc AS sc2,
         count(*)::BIGINT AS inter_count
  FROM ex a JOIN ex b ON a.shg = b.shg AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
jpairs AS (
  SELECT id1, id2, inter_count,
         (sc1 + sc2 - inter_count)::BIGINT AS union_count
  FROM rawpairs
  WHERE inter_count * 5 >= (sc1 + sc2 - inter_count) * 2
)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_signatures_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P10/P11 analog: per-doc signature scalars (token count, distinct
    shingle count, content md5, winnowing fingerprint)."""
    docs = _docs(spark, sf_dir)
    from vid_dup_finder_lib_spark.functions.text import shingles_col

    norm = normalize_text(F.col("text"))
    toks = tokens_col(norm)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(shingles_col(toks, 3)).cast("long").alias("n_shingles"),
        F.md5(norm).alias("content_md5"),
        doc_fingerprint(F.col("text"), 3).alias("fingerprint"),
    )


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/P11: exact-dup classes over the derived corpus (every base doc has
    one planted verbatim copy)."""
    d = _derived_exact(_docs(spark, sf_dir))
    return (
        d.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.count("*").alias("group_size"),
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))).alias(
                "members"
            ),
        )
        .where(F.col("group_size") >= 2)
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 exact path: all pairs with shingle-Jaccard >= 0.4 via explode+join."""
    sigs = _neardup_signatures(_docs(spark, sf_dir))
    return ngram_jaccard_pairs(sigs, JACCARD_NUM, JACCARD_DEN).select(
        "id1", "id2", "inter_count", "union_count"
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 core: MinHash LSH band self-join candidates, exact-Jaccard verify.
    Equals the exact oracle iff LSH recall is 1 at this config (it is, to
    P > 0.99998 per pair)."""
    sigs = _neardup_signatures(_docs(spark, sf_dir)).localCheckpoint(eager=True)
    pairs, _quarantined = candidate_pairs(sigs, ENTRY_CFG)
    edges = verified_edges(
        pairs,
        sigs,
        ENTRY_CFG,
        jaccard_num_den=(JACCARD_NUM, JACCARD_DEN),
        length_band=False,
    )
    return edges.select("id1", "id2", "inter_count", "union_count")


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace + BPE-ish token counting."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: integer quality sub-scores."""
    docs = _docs(spark, sf_dir)
    comp = quality_score_components(F.col("text"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[c.alias(name) for name, c in comp.items()],
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: stopword-ratio language ID heuristic."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        langid_heuristic(F.col("text")).alias("lang_guess"),
        *[
            stopword_hits(F.col("text"), lang).alias(f"hits_{lang}")
            for lang in sorted(STOPWORDS)
        ],
    )


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: LSH near-dup pairs."""
    return q_minhash_lsh_pairs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "signatures_basic": q_signatures_basic,
        "exact_dup_groups": q_exact_dup_groups,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "token_counts": q_token_counts,
        "quality_score": q_quality_score,
        "langid": q_langid,
    }


def oracle_sql() -> dict[str, str]:
    sw = {lang: ", ".join(f"'{w}'" for w in ws) for lang, ws in STOPWORDS.items()}
    langs = sorted(STOPWORDS)
    hit_exprs = ",\n  ".join(
        f"len(list_filter(toks, x -> x IN ({sw[lang]})))::BIGINT AS hits_{lang}"
        for lang in langs
    )
    # argmax with alphabetical tiebreak, 'und' when all zero
    best = "CASE "
    for lang in langs:
        others_strict = " AND ".join(
            f"hits_{lang} > hits_{o}" for o in langs if o < lang
        )
        others_ge = " AND ".join(
            f"hits_{lang} >= hits_{o}" for o in langs if o > lang
        )
        cond = " AND ".join(x for x in [f"hits_{lang} > 0", others_strict, others_ge] if x)
        best += f"WHEN {cond} THEN '{lang}' "
    best += "ELSE 'und' END"

    return {
        "signatures_basic": _SQL_PROLOGUE
        + r"""
, base_sh AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE []::VARCHAR[] END AS shingles
  FROM tok
)
SELECT b.doc_id,
       b.n_tokens,
       len(b.shingles)::BIGINT AS n_shingles,
       md5(n.norm) AS content_md5,
       CASE WHEN len(b.shingles) > 0
            THEN list_aggregate(list_transform(b.shingles, s -> md5(s)), 'min')
       END AS fingerprint
FROM base_sh b JOIN norm n USING (doc_id)
""",
        "exact_dup_groups": _SQL_PROLOGUE
        + r"""
, dexact AS (
  SELECT doc_id, array_to_string(toks, ' ') AS text2 FROM tok
  UNION ALL
  SELECT doc_id + 200000, array_to_string(toks, ' ') FROM tok
)
SELECT md5(text2) AS content_md5,
       count(*)::BIGINT AS group_size,
       array_to_string(list_sort(list(doc_id::VARCHAR)), ',') AS members
FROM dexact
GROUP BY 1 HAVING count(*) >= 2
""",
        "ngram_jaccard_pairs": _SQL_PROLOGUE
        + "SELECT id1, id2, inter_count, union_count FROM jpairs",
        "minhash_lsh_pairs": _SQL_PROLOGUE
        + "SELECT id1, id2, inter_count, union_count FROM jpairs",
        "token_counts": _SQL_PROLOGUE
        + r"""
SELECT doc_id,
       len(toks)::BIGINT AS ws_tokens,
       list_aggregate(list_transform(toks, t -> (length(t) + 3) // 4), 'sum')::BIGINT AS bpe_tokens
FROM tok
""",
        "quality_score": _SQL_PROLOGUE
        + r"""
SELECT n.doc_id,
       len(t.toks)::BIGINT AS n_tokens,
       length(n.norm)::BIGINT AS n_chars,
       (length(n.norm) - length(regexp_replace(n.norm, '[^\w\s]', '', 'g')))::BIGINT AS punct_chars,
       (length(trim(d.text)) - length(regexp_replace(trim(d.text), '[A-Z]', '', 'g')))::BIGINT AS upper_chars,
       len(list_filter(t.toks, x -> x IN ('the','a','of','and','to','in','is','it')))::BIGINT AS stopword_hits_en,
       CASE WHEN len(t.toks) > 0
            THEN CAST(list_aggregate(list_transform(t.toks, s -> length(s)), 'sum') * 100 // len(t.toks) AS BIGINT)
            ELSE 0 END AS mean_token_len_x100
FROM norm n JOIN tok t USING (doc_id) JOIN documents d ON d.doc_id = n.doc_id
""",
        "langid": _SQL_PROLOGUE
        + f"""
, hits AS (
  SELECT doc_id,
  {hit_exprs}
  FROM tok
)
SELECT doc_id, {best} AS lang_guess, {", ".join(f"hits_{lang}" for lang in langs)}
FROM hits
""",
    }
