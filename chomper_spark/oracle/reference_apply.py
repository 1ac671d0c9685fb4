"""Single-threaded pandas reference applier — the correctness oracle.

Faithful to the reference's per-row upsert loop: for each incoming
item, SELECT by identifiers, then UPDATE if found else INSERT
(chomper/contrib/postgres.py:335-393 and
chomper/contrib/sql/exporters.py:234-252), extended with the north
rule's delete op.  Events are replayed in global (op_ts, batch_seq)
order — the binlog total order — so the final table state is what a
correct single-writer DB would hold.

Tests assert exact final-table equality (including per-turn text
equality under stable turn ordering) between this oracle and the
Spark engine, including after double-replay and checkpoint-resume.
"""

from __future__ import annotations

import pandas as pd


def reference_apply(
    events: pd.DataFrame,
    key_cols: list[str] | None = None,
    version_cols: list[str] | None = None,
    update_only_nulls: bool = False,
    insert_missing: bool = True,
    protected: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Replay a change feed row-at-a-time; return the final table."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    version_cols = version_cols or ["op_ts", "batch_seq"]
    payload_cols = [c for c in events.columns if c not in ("op", "batch_id", *version_cols)]
    data_cols = [c for c in payload_cols if c not in key_cols]

    ordered = events.sort_values(version_cols, kind="mergesort")
    state: dict[tuple, dict] = {}
    tombstone: set[tuple] = set()
    for row in ordered.itertuples(index=False):
        r = row._asdict()
        key = tuple(r[k] for k in key_cols)
        if r["op"] == "D":
            state.pop(key, None)
            tombstone.add(key)
            continue
        existing = state.get(key)
        if existing is None:
            if not insert_missing:
                continue
            state[key] = {c: r[c] for c in payload_cols}
            tombstone.discard(key)
        else:
            for c in data_cols:
                if c in protected:
                    continue
                if update_only_nulls and pd.notna(existing.get(c)):
                    continue
                existing[c] = r[c]
    if not state:
        return pd.DataFrame(columns=payload_cols)
    out = pd.DataFrame(list(state.values()), columns=payload_cols)
    return out.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
