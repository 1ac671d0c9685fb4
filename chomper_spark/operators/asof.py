"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the most recent right row for the same key
with ``right_ts <= left_ts``.  The classic CDC/temporal lookup: "what
was the dimension's state when this event happened".

Implementation is a composition of existing DataFrame ops (no UDF, no
range explosion): union the two sides with a side tag, run ONE window
per key ordered by (ts, side) carrying the right side's payload forward
with ``last(..., ignorenulls=True)``, then keep the left rows.  Cost is
a single hash-partitioned sort per key — the same shape as the dedup
window, so it scales exactly as far.  (The naive alternative — a range
join ``l JOIN r ON key AND r.ts <= l.ts`` + max — is O(n·m) per key and
collapses on hot keys.)

Row-image atomicity: the right value columns are carried as ONE
nullable struct, so the attached values always come from a single right
row.  Carrying each column independently would splice a legitimately-
NULL column from an OLDER right row into a newer row image — diverging
from DuckDB ASOF JOIN semantics.

Ordering tie-break: at equal timestamps the right row sorts BEFORE the
left row (side tag 0 < 1), so an exactly-simultaneous right value is
visible to the left row — matching DuckDB's native ASOF JOIN
(right_ts <= left_ts), which the driver oracle uses.  Ties BETWEEN
right rows at identical (key, ts) are resolved arbitrarily (same as
DuckDB) — keep right (key, ts) unique for full determinism.

Skew: the single-window form partitions on the join key alone, so one
hot key (a user with 10^9 events) becomes a single-task sort.  Pass
``chunk_seconds`` to switch to the two-pass time-chunked form: rows
are windowed per (key, time_chunk) — bounded task size — and a tiny
per-(key, chunk) boundary table carries the latest right image across
chunk boundaries.  Same semantics, every shuffle keyed on (key, chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

_SIDE = "_asof_side"
_R = "_asof_r"
_CHUNK = "_asof_chunk"

# per-task sort bound the "auto" probe enforces: a key whose row count
# exceeds this switches the join to the time-chunked form with a chunk
# width sized to put ~this many rows in each (key, chunk) task
AUTO_HOT_KEY_ROWS = 1_000_000


def _ts_seconds(ts_type: T.DataType) -> F.Column:
    """Numeric seconds for _asof_ts (timestamp or numeric event-time)."""
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        # unix_micros rejects TIMESTAMP_NTZ (the parquet default in
        # Spark 4) — cast first; value-preserving in a UTC session
        return F.unix_micros(F.col("_asof_ts").cast("timestamp")) / F.lit(1_000_000.0)
    return F.col("_asof_ts").cast("double")


def _auto_chunk_seconds(
    tagged: DataFrame, on: list[str], hot_rows: int
) -> float | None:
    """Probe the tagged union for hot keys: one map-side-combinable
    aggregate (per-key count + ts bounds, then a global reduce).  Thin
    keys → None (single-window form, no chunk overhead).  For each key
    above ``hot_rows`` the candidate width is that key's OWN span
    divided into ceil(n/hot_rows) chunks — the key's own time
    distribution, not the global one: a 2M-row key concentrated in one
    hour must be split by an hour-scale width even when other keys
    span years.  The tightest (minimum) hot-key width wins; hot keys
    whose rows all share one timestamp are unsplittable by time and
    are ignored (a window cannot help them either way).

    Cost: the probe is one extra job, but Catalyst prunes its scan to
    just the key + ts columns (the value/struct projections fall away
    — pinned by a plan test), so it never re-reads payload data.  Pass
    chunk_seconds=None to skip it when keys are known-thin."""
    ts = _ts_seconds(tagged.schema["_asof_ts"].dataType)
    per_key = tagged.groupBy(*on).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(ts).alias("_mn"),
        F.max(ts).alias("_mx"),
    )
    row = (
        per_key.filter(F.col("_n") > hot_rows)
        .select(
            F.min(
                F.when(
                    F.col("_mx") > F.col("_mn"),
                    (F.col("_mx") - F.col("_mn"))
                    / F.ceil(F.col("_n") / F.lit(float(hot_rows))),
                )
            ).alias("w")
        )
        .first()
    )
    if row is None or row["w"] is None:
        return None
    return max(float(row["w"]), 1e-6)


def _tag_sides(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> tuple[DataFrame, T.StructType]:
    """Union-tag the two sides; right values ride in one nullable struct."""
    r_struct_type = T.StructType([right.schema[c] for c in value_cols])
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r_struct_type).alias(_R),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).cast(l_tagged.schema["_asof_ts"].dataType).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in value_cols]).alias(_R),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
    )
    return l_tagged.unionByName(r_tagged), r_struct_type


def _unpack(carried: DataFrame, value_cols: list[str]) -> DataFrame:
    return carried.filter(F.col(_SIDE) == 1).select(
        "_l.*", *[F.col(f"{_R}.{c}").alias(c) for c in value_cols]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    chunk_seconds: float | None | str = "auto",
    auto_hot_rows: int = AUTO_HOT_KEY_ROWS,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right values
    at-or-before its timestamp (NULL when no prior right row).

    ``chunk_seconds`` selects the skew-hardened two-pass form (see
    module docstring).  The default "auto" probes per-key row counts
    (one small aggregate job) and switches to the chunked form with a
    derived width whenever any key exceeds ``auto_hot_rows`` — the
    hot-key-safe path needs no caller flag at scale.  Pass a number to
    force a width, or None to force the single-window form (skips the
    probe)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (*on, right_ts)
    ]
    tagged, _ = _tag_sides(left, right, on, left_ts, right_ts, value_cols)

    if chunk_seconds == "auto":
        # NOTE (since round 4): "auto" is EAGER — the probe runs a small
        # aggregate job at plan-construction time.  Streaming plans
        # cannot run first(), and callers that need lazy construction
        # should pass chunk_seconds=None (single-window) or a number.
        if left.isStreaming or right.isStreaming:
            chunk_seconds = None
        else:
            chunk_seconds = _auto_chunk_seconds(tagged, on, auto_hot_rows)

    if chunk_seconds is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("_asof_ts", _SIDE)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = tagged.select(
            _SIDE, "_l", F.last(_R, ignorenulls=True).over(w).alias(_R)
        )
        return _unpack(carried, value_cols)

    # -- two-pass time-chunked form: bounded per-task sort on hot keys
    ts_type = tagged.schema["_asof_ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        # unix_micros rejects TIMESTAMP_NTZ (the parquet default in
        # Spark 4) — cast first; value-preserving in a UTC session
        chunk = F.floor(
            F.unix_micros(F.col("_asof_ts").cast("timestamp"))
            / F.lit(int(chunk_seconds * 1_000_000))
        )
    else:  # numeric event-time (epoch seconds / logical ticks)
        chunk = F.floor(F.col("_asof_ts") / F.lit(chunk_seconds)).cast("long")
    tagged = tagged.withColumn(_CHUNK, chunk)

    # pass 1a: within-chunk carry — window partitioned on (key, chunk),
    # so a hot key's rows split across ceil(span/chunk_seconds) tasks
    w_chunk = (
        Window.partitionBy(*on, _CHUNK)
        .orderBy("_asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = tagged.select(
        *on, _CHUNK, _SIDE, "_l",
        F.last(_R, ignorenulls=True).over(w_chunk).alias("_within"),
    )

    # pass 1b: per-(key, chunk) boundary table — the latest right image
    # in each chunk.  One row per (key, chunk): tiny relative to input.
    chunk_last = (
        tagged.filter(F.col(_SIDE) == 0)
        .groupBy(*on, _CHUNK)
        .agg(F.max_by(_R, F.col("_asof_ts")).alias("_final"))
    )
    all_chunks = tagged.select(*on, _CHUNK).distinct()
    w_carry = (
        Window.partitionBy(*on)
        .orderBy(_CHUNK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # this window partitions by key alone, but its input is the chunk
    # table (one row per (key, chunk)) — bounded even for a hot key
    carry = all_chunks.join(chunk_last, on=[*on, _CHUNK], how="left").select(
        *on, _CHUNK, F.last("_final", ignorenulls=True).over(w_carry).alias("_carry")
    )

    # pass 2: stitch — within-chunk value if present, else the carry-in
    # from the newest earlier chunk.  Equi-join on (key, chunk).
    carried = within.join(carry, on=[*on, _CHUNK], how="left").select(
        _SIDE, "_l", F.coalesce(F.col("_within"), F.col("_carry")).alias(_R)
    )
    return _unpack(carried, value_cols)
