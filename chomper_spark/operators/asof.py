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

Ordering tie-break: at equal timestamps the right row sorts BEFORE the
left row (side tag 0 < 1), so an exactly-simultaneous right value is
visible to the left row — matching DuckDB's native ASOF JOIN
(right_ts <= left_ts), which the driver oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right values
    at-or-before its timestamp (NULL when no prior right row)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (*on, right_ts)
    ]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).cast(l_tagged.schema["_asof_ts"].dataType).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        _SIDE,
        "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
    )
    out = carried.filter(F.col(_SIDE) == 1).select(
        "_l.*", *[F.col(f"_r_{c}").alias(c) for c in value_cols]
    )
    return out
