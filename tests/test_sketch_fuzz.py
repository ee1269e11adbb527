"""Differential fuzz of the HLL sketch algebra against a per-key Python
md5 reference.

operators/sketch.py freezes a cross-engine contract (md5-prefix bucket +
48-bit rank word, exact-integer harmonic fold, `div` estimate) so Spark
and the DuckDB oracle hash-match bit-for-bit.  The existing tests pin
fixed corpora, the alpha constants, and merge-of-two; this file checks
the whole register/report algebra over many RANDOM corpora — unicode
keys, heavy duplication, singleton groups, null mixing — against a
reference that computes every step key-at-a-time in big-int Python:

* register table parity: per-(corpus, bucket) max rank equals the
  reference dict for every corpus;
* report parity: n_zero_buckets, registers_md5 digest, and the
  exact-integer `div` estimate all reproduce the reference;
* merge identity under fuzz: sketch(A) merged with sketch(B) equals
  sketch(A ∪ B) register-for-register for random splits.

All ~40 random corpora fold into ONE Spark job via the group column
(the repo's pattern for randomized Spark properties, cf.
test_components.test_random_graphs) so the fuzz stays cheap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.sketch import (
    _ALPHA_E6,
    hll_merge_registers,
    hll_registers,
    hll_report,
)

_MAX_RANK = 49
_P = 8  # m = 256: small enough that random corpora leave zero buckets


def _ref_registers(keys: list[str | None], p: int) -> dict[int, int]:
    regs: dict[int, int] = {}
    for s in keys:
        if s is None:
            continue
        h = hashlib.md5(s.encode("utf-8")).hexdigest()
        bucket = int(h[: p // 4], 16)
        w = int(h[p // 4 : p // 4 + 12], 16)
        rho = _MAX_RANK if w == 0 else _MAX_RANK - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _ref_report(regs: dict[int, int], p: int) -> tuple[int, str, int]:
    """(n_zero_buckets, registers_md5, estimate) the slow obvious way."""
    m = 1 << p
    denom = sum(1 << (_MAX_RANK - r) for r in regs.values())
    denom += (m - len(regs)) * (1 << _MAX_RANK)
    estimate = _ALPHA_E6[p] * m * m * (1 << _MAX_RANK) // (denom * 1_000_000)
    digest = hashlib.md5(
        ",".join(f"{b}:{regs[b]}" for b in sorted(regs)).encode()
    ).hexdigest()
    return m - len(regs), digest, estimate


def _random_corpora(rng: np.random.Generator, n_corpora: int) -> dict[str, list]:
    """Random corpora with duplication structure and unicode keys; corpus
    g00 additionally mixes in nulls (skipped per count(DISTINCT)
    semantics — the reference skips them too)."""
    pools = [
        [f"k{j}" for j in range(2000)],
        [f"ключ-{j}" for j in range(500)],
        [f"键{j}·→" for j in range(300)],
        ["", " ", "\t", "a" * 200],
    ]
    corpora: dict[str, list] = {}
    for i in range(n_corpora):
        name = f"g{i:02d}"
        n = int(rng.integers(1, 400))
        keys: list = []
        for _ in range(n):
            pool = pools[int(rng.integers(0, len(pools)))]
            keys.append(pool[int(rng.integers(0, len(pool)))])
        if i == 0:
            keys += [None] * 5
        corpora[name] = keys
    return corpora


def test_hll_registers_and_report_match_reference(spark):
    rng = np.random.default_rng(41)
    corpora = _random_corpora(rng, 40)
    rows = [(g, k) for g, keys in corpora.items() for k in keys]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["corpus", "key"])
    ).repartition(9)

    regs = hll_registers(df, ["corpus"], F.col("key"), p=_P)
    got_regs: dict[str, dict[int, int]] = {}
    for r in regs.collect():
        got_regs.setdefault(r["corpus"], {})[r["bucket"]] = r["r"]
    for g, keys in corpora.items():
        assert got_regs.get(g, {}) == _ref_registers(keys, _P), g

    report = {r["corpus"]: r for r in hll_report(regs, ["corpus"], p=_P).collect()}
    assert set(report) == set(corpora)
    for g, keys in corpora.items():
        n_zero, digest, estimate = _ref_report(_ref_registers(keys, _P), _P)
        row = report[g]
        assert row["m_buckets"] == 1 << _P
        assert row["n_zero_buckets"] == n_zero, g
        assert row["registers_md5"] == digest, g
        assert row["estimate"] == estimate, g


def test_hll_merge_identity_under_fuzz(spark):
    """sketch(A) ⊔ sketch(B) == sketch(A ∪ B) register-for-register on
    random corpora and random splits (the max-semilattice identity the
    shard-rollup path relies on)."""
    rng = np.random.default_rng(43)
    corpora = _random_corpora(rng, 20)
    part_a, part_b, full = [], [], []
    for g, keys in corpora.items():
        for k in keys:
            (part_a if rng.random() < 0.5 else part_b).append((g, k))
            full.append((g, k))
    # a corpus whose keys all land on one side: the merge must carry it
    part_a = [r for r in part_a if r[0] != "g01"]

    def _sketch(rows):
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["corpus", "key"]))
        return hll_registers(df, ["corpus"], F.col("key"), p=_P)

    merged = hll_merge_registers(_sketch(part_a), _sketch(part_b), ["corpus"])
    whole = hll_registers(
        spark.createDataFrame(pd.DataFrame(full, columns=["corpus", "key"])),
        ["corpus"],
        F.col("key"),
        p=_P,
    )
    key = lambda r: (r["corpus"], r["bucket"])  # noqa: E731
    got = {key(r): r["r"] for r in merged.collect()}
    # dropping g01's A-side rows may lose keys the B side never saw, so
    # g01 is checked against the reference of its surviving (B) keys
    want_minus = {
        key(r): r["r"]
        for r in whole.collect()
        if not (r["corpus"] == "g01")
    }
    want_g01 = _ref_registers([k for g, k in part_b if g == "g01"], _P)
    assert {k: v for k, v in got.items() if k[0] != "g01"} == want_minus
    assert {b: r for (g, b), r in got.items() if g == "g01"} == want_g01
