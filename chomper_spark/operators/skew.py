"""Explicit skew handling & staging partitioners (north rule).

Zipf-hot conversations make any conv_id-keyed shuffle skewed.  Three
layers of defence, all used by the engine:

1. The MERGE key is the FULL primary key (conv_id, turn_idx) — the
   turn index acts as a built-in salt, so the merge join and the state
   bucketing never see single-key hotspots.
2. ``stage_by_conv`` — the north rule's "per-(conv_id) key-partitioned
   micro-batches": repartitionByRange on (conv_id, turn_idx) so a
   conversation's turns are contiguous (range metadata enables
   partition pruning on downstream conv_id predicates) while still
   splitting a giant conversation across partitions.
3. ``with_salt`` / ``desalt`` — explicit salting for conv_id-only
   aggregations (e.g. per-conversation rollups): two-phase agg over
   (conv_id, salt) then conv_id.
4. AQE skew-join splitting stays on (session.py) as the runtime
   backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stage_by_conv(batch: DataFrame, num_partitions: int | None = None) -> DataFrame:
    cols = [F.col("conv_id"), F.col("turn_idx")]
    if num_partitions:
        return batch.repartitionByRange(num_partitions, *cols)
    return batch.repartitionByRange(*cols)


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the full key (NOT random — bench
    and tests need stable results across runs and parallelism)."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(F.col("conv_id").cast("string"), F.col("turn_idx").cast("string")),
            F.lit(n_salts),
        ).cast("int"),
    )


def salted_count_per_conv(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe per-conversation count: partial agg on
    (conv_id, salt) — map-side combinable, hot key split n_salts ways —
    then final agg on conv_id."""
    return (
        with_salt(df, n_salts)
        .groupBy("conv_id", "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy("conv_id")
        .agg(F.sum("_partial").alias("n_events"))
    )
