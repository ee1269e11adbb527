"""Signature / search configuration.

The reference freezes its hash geometry in
``vid_dup_finder_lib/src/definitions.rs:34-43`` (DCT_SIZE=16, HASH_SIZE=10,
HASH_BITS=1000, TOLERANCE_SCALING_FACTOR=1000) and records the build options
as a cache *fingerprint* that must match before cached hashes may be reused
(``vid_dup_finder_app/src/video_hash_filesystem_cache/cache_metadata.rs:127-162``).

`SigConfig` plays both roles here: it fixes the text-signature geometry
(shingle size, MinHash permutations, LSH banding, SimHash width) and its
``fingerprint()`` guards checkpoint-table reuse exactly like the reference's
metadata file.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# The MinHash universal-hash family lives in functions/hashing.py and uses
# the 31-bit Mersenne prime (2^31 - 1) over 32-bit-folded shingle hashes:
# 31-bit a * 32-bit x + 31-bit b stays < 2^64, so the whole family evaluates
# in native numpy uint64 with no modular-multiplication tricks.

# The reference maps user tolerance t in [0,1] to an integer Hamming radius
# floor(t * 1000) (definitions.rs:40, search_algorithm.rs:64,82).  We keep the
# same scaling so the re-expressed matchset tests use identical tolerances.
TOLERANCE_SCALING_FACTOR = 1000


@dataclass(frozen=True)
class SigConfig:
    """Frozen signature geometry + search knobs.

    Defaults follow BASELINE.json's north_star: 128-perm MinHash banded for
    LSH, 64-bit SimHash, word shingles.
    """

    shingle_k: int = 3            # tokens per shingle
    # content-sampling policy (S5): the reference hashes 10 s of video after
    # a 15 s skip (definitions.rs:18,29) with graceful short-video fallbacks
    # (video_hash_builder.rs:85-157).  Text analog: signature over tokens
    # [skip_tokens, skip_tokens + max_tokens); docs shorter than the skip
    # fall back to their full token stream.  0/None = whole document.
    skip_tokens: int = 0
    max_tokens: int | None = None
    num_perms: int = 128          # MinHash permutations
    lsh_bands: int = 32           # bands (b); rows r = num_perms // bands
    simhash_bits: int = 64
    seed: int = 42
    # self-search length window: candidate eligible if doclen <= 1.10 * seed
    # doclen (search_algorithm.rs:93-116); refs search uses +/-5 %
    # (search_algorithm.rs:173-185).
    self_len_ratio: float = 1.10
    ref_len_ratio: float = 1.05
    default_tolerance: float = 0.35   # definitions.rs:5

    # skew control: LSH buckets larger than this are quarantined + reported,
    # never silently dropped (SURVEY.md §7 "hard parts" item 3).
    max_bucket_size: int = 50_000

    # candidate filter: keep only pairs colliding in >= c of the b bands
    # (1 = classic OR-of-bands).  Collisions ~ Binomial(b, J^r), so raise
    # this only when E[collisions] at the verify threshold is >> c (e.g.
    # b=64, r=2, J=1/2: E=16, P(<3) ~ 2.5e-6) — the high-noise-floor
    # regimes (char-grams over templated text) where OR-of-bands floods
    # the verify join with J~0.1 background pairs.  Semantics-affecting:
    # part of the fingerprint, so stores/folds never mix collision rules.
    min_band_collisions: int = 1

    def __post_init__(self) -> None:
        if self.num_perms % self.lsh_bands != 0:
            raise ValueError(
                f"num_perms={self.num_perms} not divisible by lsh_bands={self.lsh_bands}"
            )
        if self.min_band_collisions < 1:
            raise ValueError(
                f"min_band_collisions must be >= 1, got {self.min_band_collisions}"
            )

    @property
    def rows_per_band(self) -> int:
        return self.num_perms // self.lsh_bands

    def radius(self, tolerance: float) -> int:
        """tolerance in [0,1] -> integer radius, as search_algorithm.rs:64."""
        return int(tolerance * TOLERANCE_SCALING_FACTOR)

    @classmethod
    def for_threshold(
        cls, j_threshold: float, min_recall: float = 0.99, **kwargs
    ) -> "SigConfig":
        """A SigConfig whose banding is planned by :func:`plan_lsh_bands`
        for the given Jaccard verify threshold — the "what config do I
        use" entry point (RECALL.md measures the same trade empirically)."""
        num_perms = kwargs.pop("num_perms", 128)
        bands, _rows = plan_lsh_bands(j_threshold, min_recall, num_perms)
        return cls(num_perms=num_perms, lsh_bands=bands, **kwargs)

    def fingerprint(self) -> str:
        """Stable hash of every semantics-affecting knob.

        Analog of the reference's cache metadata validate-or-die
        (cache_metadata.rs:127-162): checkpoint tables written under one
        fingerprint are never reused under another.
        """
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


def plan_lsh_bands(
    j_threshold: float, min_recall: float = 0.99, num_perms: int = 128
) -> tuple[int, int]:
    """Cheapest LSH banding meeting a candidate-recall floor at a Jaccard
    verify threshold.  Returns ``(bands, rows)`` with ``bands * rows ==
    num_perms``.

    Candidate recall of (b bands × r rows) at similarity J is the
    classic ``1 - (1 - J^r)^b``.  Cost falls as r grows — fewer band keys
    per doc in the self-join explode AND background collisions decay as
    J_background^r (the dominant term in bucket sizes over web text) — so
    the planner picks the LARGEST r (over the divisors of ``num_perms``)
    whose recall at the threshold still clears ``min_recall``: the
    cheapest geometry that is still safe.  Pairs ABOVE the threshold only
    have higher recall; the floor binds at the threshold itself.

    Raises if no divisor geometry reaches the floor (thresholds so low
    that even r=1's ``1-(1-J)^num_perms`` misses — raise ``num_perms`` or
    lower the floor explicitly; no silent fallback).  The measured
    counterpart of this formula is RECALL.md's (perms, bands) sweep; the
    default library geometry (128 perms, 64×2 at the J=0.4 oracle
    threshold, 32×4 at the default tolerance) is exactly what this
    planner returns for those inputs.
    """
    if not (0.0 < j_threshold <= 1.0):
        raise ValueError(f"j_threshold must be in (0, 1], got {j_threshold}")
    if not (0.0 < min_recall < 1.0):
        raise ValueError(f"min_recall must be in (0, 1), got {min_recall}")
    best: tuple[int, int] | None = None
    for rows in range(num_perms, 0, -1):
        if num_perms % rows:
            continue
        bands = num_perms // rows
        recall = 1.0 - (1.0 - j_threshold**rows) ** bands
        if recall >= min_recall:
            best = (bands, rows)
            break
    if best is None:
        raise ValueError(
            f"no (bands, rows) over {num_perms} perms reaches recall "
            f"{min_recall} at J={j_threshold}; raise num_perms or lower "
            "the floor"
        )
    return best


DEFAULT_CONFIG = SigConfig()
