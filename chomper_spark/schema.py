"""Canonical schemas for the CDC engine.

The reference is schemaless (dict ``Item``s, chomper/items.py:181-227;
type lattice chomper/utils.py:6-17) and discovers columns at the sink
(chomper/contrib/postgres.py:75-108).  Our engine is the opposite —
explicit StructTypes on read, with a schema-evolution path (see
``operators/evolve.py``) standing in for the reference's silent
"write the intersection of item keys × table columns" behaviour.

Data model (BASELINE.json input_hint):
  * TRANSCRIPT — the target lake table of multi-turn conversation /
    agent transcripts, primary key (conv_id, turn_idx).
  * CHANGE_EVENT — binlog/WAL-shaped change feed: op ('I'|'U'|'D'),
    op_ts, batch_seq + the full row image.  Mirrors the reference's
    upsert identifying-columns model (``identifiers``,
    chomper/contrib/postgres.py:186-213) with
    identifiers=['conv_id','turn_idx'].
  * LINEAGE — per-(batch, partition) metrics, the analogue of the
    reference's items_processed/items_dropped counters
    (chomper/importers.py:44-45,81,102-105).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Target table: transcripts, PK (conv_id, turn_idx)
# ---------------------------------------------------------------------------

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool", "ts"]

TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Change feed: op metadata + full row image
# ---------------------------------------------------------------------------

OP_COL = "op"  # 'I' | 'U' | 'D'
VERSION_COLS = ["op_ts", "batch_seq"]  # total order: (op_ts, batch_seq)

CHANGE_EVENT = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("op_ts", T.TimestampType(), False),
        T.StructField("batch_seq", T.LongType(), False),
    ]
    + TRANSCRIPT.fields
)

# Metadata columns carried in the snapshot state (never user-visible):
# the applied version of each key, plus a tombstone flag so that late
# (out-of-order) events arriving after a delete cannot resurrect a row.
META_OP_TS = "_op_ts"
META_BATCH_SEQ = "_batch_seq"
META_DELETED = "_deleted"
META_COLS = [META_OP_TS, META_BATCH_SEQ, META_DELETED]

# E9 .timestamps() audit columns (chomper/contrib/sql/exporters.py:110-145):
# created_at fixed at insert, updated_at advanced on every applied
# change.  USER-VISIBLE table columns (read() keeps them), but engine-
# managed: never sourced from the batch, always from the batch time
# parameter — current_timestamp() would break replay determinism.
AUDIT_CREATED = "created_at"
AUDIT_UPDATED = "updated_at"
AUDIT_COLS = [AUDIT_CREATED, AUDIT_UPDATED]

# ---------------------------------------------------------------------------
# Lineage / metrics table (FIXTURES.md §3)
# ---------------------------------------------------------------------------

LINEAGE = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("events_applied", T.LongType(), False),
        T.StructField("dedup_drops", T.LongType(), False),
        T.StructField("merge_rows", T.LongType(), False),
        T.StructField("watermark_lag_ms", T.LongType(), True),
    ]
)

# Type-widening lattice for schema evolution ("number" int+float merged in
# the reference, chomper/utils.py:6-17 → explicit widen cases for us).
WIDEN = {
    ("integer", "long"): True,
    ("integer", "double"): True,
    ("long", "double"): True,
    ("float", "double"): True,
    ("date", "timestamp"): True,
}


def can_widen(from_type: T.DataType, to_type: T.DataType) -> bool:
    return (from_type.typeName(), to_type.typeName()) in WIDEN
