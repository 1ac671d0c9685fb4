"""Latest-wins deduplication of a change micro-batch.

North rule: "deduplicate by (conv_id, turn_idx, op_ts) with
window/row_number".  One shuffle on the key; the window's hash
partitioning doubles as the per-key staging the MERGE join reuses.

The reference applies events one at a time so the *last processed*
event wins implicitly (chomper/contrib/postgres.py:335-393); at scale
we make the total order explicit: (op_ts DESC, batch_seq DESC) —
batch_seq is the binlog sequence tie-breaker giving the "stable turn
ordering" the invariant requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from chomper_spark import schema as S


def dedup_latest(
    batch: DataFrame,
    key_cols: list[str] | None = None,
    version_cols: list[str] | None = None,
) -> DataFrame:
    """Keep only the newest event per key within a micro-batch."""
    key_cols = key_cols or S.KEY_COLS
    version_cols = version_cols or S.VERSION_COLS
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in version_cols])
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
