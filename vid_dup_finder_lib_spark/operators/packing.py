"""Token-budget shard packing for training-data export.

A training pipeline's last mile: assign documents, in a stable total
order, to contiguous shards of ~``budget`` tokens each — the step that
turns a deduplicated corpus into bounded-size training shards (data-loader
files, tokenizer batches).  The reference's closest analog is its ordered
output grouping (search_output.rs's deterministic ordering); the budget
semantics are the standard contiguous-packing rule.

Semantics (exact, SQL-reproducible):

* documents are ordered by ``order_col`` (ties must not exist — use a
  unique id);
* ``shard_id = floor(exclusive_running_sum(weight) / budget)`` — a doc
  whose tokens straddle a budget boundary belongs to the shard where it
  STARTS, so every shard except possibly the last holds at least
  ``budget`` tokens minus one doc and at most ``budget`` plus one doc's
  overflow.  No doc is split (training shards want whole documents).

Scale shape: the global running sum is ``operators/prefix.
exclusive_running_sum`` — range partition + partition-local window +
per-partition base offsets, no single-partition window, no unbounded
driver state.  One shuffle (the range partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vid_dup_finder_lib_spark.operators.prefix import exclusive_running_sum


def pack_shards(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Adds ``shard_id`` (0-based long) and ``shard_offset`` (tokens before
    this doc within the global order).  ``budget`` must be positive; null
    or negative weights RAISE (a silent null would shift every later
    shard boundary — the repo's no-silent-drops rule)."""
    if budget <= 0:
        raise ValueError(f"pack_shards: budget must be positive, got {budget}")
    w = F.col(weight_col)
    guarded = docs.withColumn(
        weight_col,
        F.when(
            w.isNull() | (w < 0),
            F.raise_error(
                F.concat(
                    F.lit(f"pack_shards: null/negative {weight_col} at "),
                    F.col(order_col).cast("string"),
                )
            ).cast("long"),
        ).otherwise(w.cast("long")),
    )
    out = exclusive_running_sum(
        guarded, [F.asc(order_col)], weight_col, out_col="shard_offset"
    )
    return out.withColumn(
        "shard_id", F.floor(F.col("shard_offset") / F.lit(budget)).cast("long")
    )
