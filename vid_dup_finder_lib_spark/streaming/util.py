"""State-partition sizing for the availableNow streaming runners.

A stateful streaming stage (windowed aggregation, ``session_window``,
``applyInPandasWithState``) creates one state-store instance PER shuffle
partition and pays a per-partition commit on every micro-batch — unlike
batch shuffles, AQE never coalesces these (AQE is disabled in stateful
workloads), so the count is pinned at query start from
``spark.sql.shuffle.partitions`` and recorded in the checkpoint.  A
bounded availableNow input should therefore size its state width from the
INPUT, not from the session's batch-shuffle default: at bench scale the
64-way default spends more wall on 64 empty state commits than on the
data (measured 4-12 s -> 2-3 s per streamed query at sf0.1), and on a
real cluster the same rule scales the width back up with the source size.

``size_state_partitions`` derives the count from source bytes (one
partition per ~64 MB, floored at 8, capped at the session's configured
shuffle width) — data-adaptive, no core-count constant.  The conf swap in
``state_partition_conf`` is scoped: the runner starts AND awaits the
query inside the context, so the recorded checkpoint value is the sized
one and the session conf is restored before control returns.

Concurrency caveat: ``spark.sql.shuffle.partitions`` is session-global,
so two runners entering the context CONCURRENTLY from driver threads
could observe each other's override.  The library's runners are
synchronous (start + await inside the scope); callers launching several
sized streaming jobs in parallel should serialize the starts or use
separate sessions.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

_KEY = "spark.sql.shuffle.partitions"


def source_bytes(path: str) -> int:
    """Total bytes under a file or directory (local source dirs only —
    the bench/oracle scratch shape; cluster deployments size from their
    catalog statistics instead)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def size_state_partitions(
    spark,
    input_bytes: int,
    bytes_per_partition: int = 64 << 20,
    floor: int = 8,
) -> int:
    cap = int(spark.conf.get(_KEY))
    want = max(floor, int(input_bytes) // int(bytes_per_partition) + 1)
    return max(1, min(cap, want))


@contextmanager
def state_partition_conf(spark, state_partitions: int | None):
    """Scoped ``spark.sql.shuffle.partitions`` override (no-op on None)."""
    if state_partitions is None:
        yield
        return
    old = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(int(state_partitions)))
    try:
        yield
    finally:
        spark.conf.set(_KEY, old)
