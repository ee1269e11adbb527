"""unit='char' through the FOLD MODES (X78 closure): incremental add,
delete, and shard merge over an UNSEGMENTED corpus must equal the
from-scratch char-unit search — and the corpus is deliberately one the
token unit is structurally blind to (no whitespace: each doc collapses to
a single giant token), so these tests cannot pass unless the char
granularity actually threads through the batch-side builds and the stored
signatures.

Corpus note: the tolerance predicate is a POSITIONAL Hamming radius, so
cluster members are built by same-position character substitutions
(alignment-preserving), the same shape as the reference's fixed-grid frame
hashes and the r4 char e2e tests.

search_delete / search_merge take no unit parameter by design: they only
re-search STORED signatures, which carry their granularity; the store
fingerprint (signature_unit in extra_fingerprint) guards flips.
"""

import pytest
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark import api
from vid_dup_finder_lib_spark.config import SigConfig
from vid_dup_finder_lib_spark.corpus import CorpusBuilder  # noqa: F401 (style parity)
from vid_dup_finder_lib_spark.operators.components import connected_components
from vid_dup_finder_lib_spark.operators.signatures import build_signatures
from vid_dup_finder_lib_spark.plans.sigstore import PartitionedSignatureStore

CFG = SigConfig(num_perms=128, lsh_bands=64, seed=42, shingle_k=5)
TOL = 0.100  # radius 100 char substitutions


def _mk(seedoff: int, n: int) -> str:
    return "".join(chr(0x4E00 + ((i * 53 + seedoff) % 900)) for i in range(n))


def _member(base: str, m: int) -> str:
    """10 same-position char substitutions, positions and glyphs varying by
    member index — pairwise Hamming <= 20, far inside radius 100."""
    s = list(base)
    for j in range(10):
        pos = (37 * (m + 1) + 89 * j) % len(base)
        s[pos] = chr(0x5900 + (m * 31 + j * 7) % 200)
    return "".join(s)


def _char_corpus(spark):
    rows, clusters = [], []
    for c in range(2):
        base = _mk(101 + 307 * c, 400)
        urls = []
        for m in range(5 + 2 * c):
            url = f"https://site{c}.example/doc{m}"
            rows.append((url, _member(base, m)))
            urls.append(url)
        clusters.append(sorted(urls))
    rows.append(("https://single.example/0", _mk(9000, 350)))
    rows.append(("https://single.example/1", _mk(4321, 380)))
    docs = spark.createDataFrame(rows, "url string, text string").repartition(4)
    return docs.localCheckpoint(eager=True), clusters


def _char_cc(docs):
    return connected_components(api.find_edges(docs, TOL, CFG, unit="char"))


def _asgn(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _char_store(spark, docs, root, buckets=4):
    store = PartitionedSignatureStore(str(root), CFG, num_buckets=buckets)
    store.write_full(
        build_signatures(docs, CFG, "url", "text", unit="char").localCheckpoint(
            eager=True
        )
    )
    return store


@pytest.fixture(scope="module")
def corpus(spark):
    return _char_corpus(spark)


def test_corpus_is_token_blind_but_char_clusters(spark, corpus):
    """Precondition the other tests lean on: the token path finds zero
    edges on the spaceless corpus, while the char path reproduces exactly
    the two planted clusters."""
    docs, clusters = corpus
    assert api.find_edges(docs, TOL, CFG).count() == 0
    got = _asgn(_char_cc(docs))
    comp_of = [{got[u] for u in cl} for cl in clusters]
    assert all(len(c) == 1 for c in comp_of)  # each cluster is one component
    assert comp_of[0] != comp_of[1]
    assert len(got) == sum(len(cl) for cl in clusters)  # singletons absent


def test_incremental_char_equals_full_search(spark, tmp_path, corpus):
    docs, clusters = corpus
    batch_urls = {clusters[0][-1], clusters[1][-1], "https://single.example/0"}
    old_docs = docs.where(~F.col("url").isin(*sorted(batch_urls)))
    new_docs = docs.where(F.col("url").isin(*sorted(batch_urls)))

    store = _char_store(spark, old_docs, tmp_path / "store")
    prev = _char_cc(old_docs).localCheckpoint(eager=True)
    got = _asgn(
        api.search_incremental(new_docs, store, prev, TOL, CFG, unit="char")
    )
    assert got == _asgn(_char_cc(docs))
    assert store.read(spark).count() == docs.count()


def test_delete_char_equals_full_search(spark, tmp_path, corpus):
    docs, clusters = corpus
    prev = _char_cc(docs).localCheckpoint(eager=True)
    store = _char_store(spark, docs, tmp_path / "store")
    victim = clusters[0][0]
    dels = spark.createDataFrame([(victim,)], "id string")
    got = api.search_delete(dels, store, prev, TOL, CFG, keep_isolated=False)
    remaining = docs.where(F.col("url") != victim)
    assert _asgn(got) == _asgn(_char_cc(remaining))
    assert store.read(spark).count() == docs.count() - 1


def test_merge_char_equals_full_search(spark, tmp_path, corpus):
    docs, clusters = corpus
    # cluster 1 SPANS the split (2 members on side B) so the merge must
    # produce cross edges from stored char signatures
    b_urls = set(clusters[1][:2])
    cond = F.col("url").isin(*sorted(b_urls))
    docs_a = docs.where(~cond).localCheckpoint(eager=True)
    docs_b = docs.where(cond).localCheckpoint(eager=True)
    store_a = _char_store(spark, docs_a, tmp_path / "a")
    store_b = _char_store(spark, docs_b, tmp_path / "b")
    prev_a = _char_cc(docs_a).localCheckpoint(eager=True)
    prev_b = _char_cc(docs_b).localCheckpoint(eager=True)
    got = _asgn(api.search_merge(store_a, prev_a, store_b, prev_b, TOL, CFG))
    want = _asgn(_char_cc(docs))
    assert got == want
    # the spanning cluster really did need cross-side char edges
    assert len({want[u] for u in clusters[1]}) == 1
