"""Custom stateful streaming operators via applyInPandasWithState.

The reference's change listeners carry state across events implicitly
(previous row image fetched per upsert, chomper/contrib/postgres.py:
395-444).  At scale, per-key state lives in Spark's state store; this
module provides the canonical example the engine needs: a per-
conversation running tracker (turns seen, latest event time, tool-call
count) maintained incrementally across micro-batches.

Arrow-batched: the user function receives pandas DataFrames per key
group (never per-row Python), and state is a compact tuple.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, tool_calls long, last_op_ts timestamp"
)
STATE_SCHEMA = "turns_seen long, tool_calls long, last_op_ts timestamp"


def _track_conversation(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one conv_id into running state."""
    turns, tools, last_ts = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        turns += len(pdf)
        tools += int(pdf["tool"].notna().sum())
        batch_max = pdf["op_ts"].max()
        if last_ts is None or (pd.notna(batch_max) and batch_max > last_ts):
            last_ts = batch_max
    state.update((turns, tools, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "turns_seen": [turns],
            "tool_calls": [tools],
            "last_op_ts": [last_ts],
        }
    )


def conversation_tracker(feed_stream: DataFrame) -> DataFrame:
    """Streaming per-conversation running aggregates with keyed state.

    Input: a streaming CHANGE_EVENT DataFrame.  Output: one updated row
    per conversation per micro-batch.  State-store partitioning is by
    conv_id (the groupBy key) — hot conversations are one key each, but
    the per-key state is O(1), so skew cannot blow memory.
    """
    return feed_stream.groupBy("conv_id").applyInPandasWithState(
        _track_conversation,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
