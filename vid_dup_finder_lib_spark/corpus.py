"""Deterministic synthetic corpus generator (FIXTURES.md).

Re-expresses the reference's test-hash constructors over text:

* ``hash_with_spatial_distance(d)`` (``video_hash.rs:275-291``— flip random
  bits until exact distance d)  ->  ``member_at_distance``: substitute exactly
  ``d`` token positions with globally-unique replacement tokens.  Unique
  replacements make planted distances *exact and non-cancelling*: for two
  members with substitution position sets P1, P2 over a shared base,
  token_hamming = |P1 ∪ P2|, and across two bases differing at position set
  D, token_hamming = |P1 ∪ P2 ∪ D| >= |D|.  The reference's generator guard
  ``intra*2 < inter`` (``test_find_all.rs:77-84``) therefore holds with
  equality-free certainty here.
* ``HashesWithDistanceSet`` (``test_find_all.rs:69-116``) -> ``make_clusters``.

Docs are emitted in the BASELINE.json input_hint shape:
``(url, warc_ts, html binary, text string, lang string)``, where ``text`` is
byte-identical to ``extraction.extract_text_bytes(html)`` (the per-row
invariant; asserted in tests).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from vid_dup_finder_lib_spark.extraction import extract_text_bytes

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
_PARA_TOKENS = 20  # tokens per <p> paragraph


@dataclass
class CorpusBuilder:
    seed: int = 42
    rng: np.random.Generator = field(init=False)
    _sub_counter: int = field(default=0, init=False)
    rows: list[dict] = field(default_factory=list, init=False)

    def __post_init__(self) -> None:
        self.rng = np.random.default_rng(np.random.PCG64(self.seed))

    # -- token-level constructors ------------------------------------------

    def base_tokens(self, doclen: int) -> list[str]:
        ids = self.rng.integers(0, 1_000_000, size=doclen)
        return [f"w{int(i):06d}" for i in ids]

    def member_at_distance(self, base: list[str], d: int) -> list[str]:
        """Exactly d substitutions at distinct positions, unique tokens."""
        if d == 0:
            return list(base)
        positions = self.rng.choice(len(base), size=d, replace=False)
        out = list(base)
        for p in positions:
            out[int(p)] = f"s{self._sub_counter:08d}"
            self._sub_counter += 1
        return out

    def base_at_distance(self, base: list[str], d: int) -> list[str]:
        """A new cluster base exactly d from ``base`` (the 'line of start
        hashes' in HashesWithDistanceSet, test_find_all.rs:90-101)."""
        return self.member_at_distance(base, d)

    # -- document assembly --------------------------------------------------

    @staticmethod
    def tokens_to_text(tokens: list[str]) -> str:
        paras = [
            " ".join(tokens[i : i + _PARA_TOKENS])
            for i in range(0, len(tokens), _PARA_TOKENS)
        ]
        return "\n".join(paras)

    @staticmethod
    def text_to_html(text: str, title: str) -> bytes:
        body = b"".join(
            b"<p>" + p.encode("utf-8") + b"</p>" for p in text.split("\n") if True
        )
        return (
            b"<html><head><title>"
            + title.encode("utf-8")
            + b"</title></head><body>"
            + body
            + b"</body></html>"
        )

    def add_doc(
        self,
        url: str,
        tokens: list[str],
        lang: str = "en",
    ) -> None:
        text = self.tokens_to_text(tokens)
        html = self.text_to_html(text, title=url)
        extracted = extract_text_bytes(html)
        assert extracted == text, "per-row invariant violated at generation time"
        self.rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + dt.timedelta(seconds=len(self.rows)),
                "html": html,
                "text": extracted,
                "lang": lang,
            }
        )

    def add_cluster(
        self,
        cluster_id: int,
        base: list[str],
        size: int,
        intra_d: int,
        site: int = 0,
    ) -> list[str]:
        """size members, each at exactly intra_d from base. Returns urls."""
        urls = []
        for m in range(size):
            url = f"https://site{site:05d}.example/{cluster_id:04d}/{m:03d}"
            self.add_doc(url, self.member_at_distance(base, intra_d))
            urls.append(url)
        return urls

    def make_clusters(
        self,
        num_clusters: int,
        first_size: int,
        size_step: int,
        intra_d: int,
        inter_d: int,
        doclen: int,
    ) -> list[list[str]]:
        """HashesWithDistanceSet analog: k clusters along a 'line', sizes
        first_size, first_size+step, ... (test_find_all.rs:69-116)."""
        assert intra_d * 2 < inter_d or num_clusters == 1, "generator guard"
        base = self.base_tokens(doclen)
        all_urls = []
        for c in range(num_clusters):
            size = first_size + c * size_step
            all_urls.append(self.add_cluster(c, base, size, intra_d, site=c))
            base = self.base_at_distance(base, inter_d)
        return all_urls

    def add_singletons(self, n: int, doclen_lo: int, doclen_hi: int, site: int = 999) -> list[str]:
        urls = []
        for i in range(n):
            doclen = int(self.rng.integers(doclen_lo, doclen_hi + 1))
            url = f"https://site{site:05d}.example/solo/{i:05d}"
            self.add_doc(url, self.base_tokens(doclen))
            urls.append(url)
        return urls

    def to_pandas(self, shuffle: bool = True) -> pd.DataFrame:
        pdf = pd.DataFrame(self.rows, columns=[f.name for f in DOCS_SCHEMA.fields])
        if shuffle:
            # analog of the all_members shuffle (test_find_all.rs:118-126)
            order = self.rng.permutation(len(pdf))
            pdf = pdf.iloc[order].reset_index(drop=True)
        return pdf

    def to_spark(self, spark: SparkSession, shuffle: bool = True, partitions: int = 8) -> DataFrame:
        return spark.createDataFrame(self.to_pandas(shuffle), schema=DOCS_SCHEMA).repartition(
            partitions
        )
