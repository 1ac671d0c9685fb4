"""Declarative per-event transforms — the reference's processor layer.

Reference inventory (SURVEY.md §2.2), each rebuilt as a small factory
returning a ``DataFrame -> DataFrame`` function so they compose into a
pipeline list exactly like the reference's
``Importer(pipeline=[...])`` (chomper/importers.py:25-89) — but the
"pipeline" is assembled into ONE Catalyst logical plan, not executed
per row.

  P1 Defaulter  (chomper/processors.py:172-210) → defaults()
  P2 Assigner   (chomper/processors.py:213-226) → assign()
  P3 Dropper/item (chomper/processors.py:229-242) → drop_rows()
  P4 Dropper/field (chomper/processors.py:244-248) → nullify_field()
  P5 Filter     (chomper/processors.py:251-268) → scalar_map()
  P6 Mapper/value (chomper/processors.py:293-300) → map_values()
  P7 Mapper/key (chomper/processors.py:283-316) → rename()
  P8 Picker     (chomper/processors.py:319-337) → pick()
  P9 Omitter    (chomper/processors.py:340-356) → omit()
  P10 Logger    (chomper/processors.py:359-368) → tap() (df.observe)
  P11 QueryAssigner (chomper/contrib/sql/processors.py:15-49)
        → lookup_join(): per-row SELECT becomes a broadcast hash join
  P12 Expression ops (chomper/items.py:6-19) → native Column operators
  P13 custom funcs (chomper/importers.py:83-95) → vectorized_map()
        (Arrow pandas_udf — never per-row Python) / fanout()
  P14 branching sub-pipelines (chomper/importers.py:84-86) → branch()
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, Window, functions as F

Transform = Callable[[DataFrame], DataFrame]


def pipe(df: DataFrame, *transforms: Transform) -> DataFrame:
    """Compose transforms left-to-right (the Importer pipeline walk,
    chomper/importers.py:77-89, as plan construction)."""
    for t in transforms:
        df = t(df)
    return df


# ----------------------------------------------------------------- P1
def defaults(mapping: dict) -> Transform:
    """Fill missing/NULL fields.  Like the reference, only NULL triggers
    — falsy values are kept (tests/test_processors.py:48-55)."""

    def _t(df: DataFrame) -> DataFrame:
        for c, v in mapping.items():
            val = v if isinstance(v, Column) else F.lit(v)
            if c in df.columns:
                df = df.withColumn(c, F.coalesce(F.col(c), val))
            else:
                df = df.withColumn(c, val)
        return df

    return _t


# ----------------------------------------------------------------- P2
def assign(name: str, value) -> Transform:
    """Set field to a static value or a Column expression computed from
    the row (the reference's callable(item))."""
    col = value if isinstance(value, Column) else F.lit(value)
    return lambda df: df.withColumn(name, col)


# ----------------------------------------------------------------- P3
def drop_rows(cond: Column) -> Transform:
    """Drop whole rows where cond is true (DropItem → dropped counter;
    the count lives in lineage metrics, not an exception path)."""
    return lambda df: df.filter(~cond)


# ----------------------------------------------------------------- P4
def nullify_field(name: str, cond: Column) -> Transform:
    """Conditionally NULL a column per row (DropField)."""
    return lambda df: df.withColumn(
        name, F.when(cond, F.lit(None)).otherwise(F.col(name))
    )


# ----------------------------------------------------------------- P5
def scalar_map(name: str, fn: Callable[[Column], Column], out: str | None = None) -> Transform:
    """Map one field through a Column expression.  NULL input passes
    through untouched (the reference skips None with a warning,
    chomper/processors.py:262-266)."""

    def _t(df: DataFrame) -> DataFrame:
        c = F.col(name)
        return df.withColumn(out or name, F.when(c.isNull(), c).otherwise(fn(c)))

    return _t


# ----------------------------------------------------------------- P6
def map_values(name: str, mapping: dict, default_passthrough: bool = True) -> Transform:
    """Dict-lookup value remap; missing key → passthrough (the
    reference's Mapper value mode).  Compiled to a literal map +
    element_at — constant-folded, codegen'd, no shuffle.  For large
    mappings prefer lookup_join with a broadcast table."""

    def _t(df: DataFrame) -> DataFrame:
        kv = []
        for k, v in mapping.items():
            kv += [F.lit(k), F.lit(v)]
        m = F.create_map(*kv)
        mapped = F.element_at(m, F.col(name))
        col = F.coalesce(mapped, F.col(name)) if default_passthrough else mapped
        return df.withColumn(name, col)

    return _t


# ----------------------------------------------------------------- P7
def rename(mapping: dict[str, str]) -> Transform:
    return lambda df: df.withColumnsRenamed(mapping)


# ----------------------------------------------------------------- P8
def pick(cols: list[str]) -> Transform:
    return lambda df: df.select(*cols)


# ----------------------------------------------------------------- P9
def omit(cols: list[str]) -> Transform:
    return lambda df: df.drop(*cols)


# ---------------------------------------------------------------- P10
def tap(name: str, *metrics: Column) -> Transform:
    """Observability tap: named accumulator metrics attached to the
    plan (df.observe) — the Logger analogue without materializing."""

    def _t(df: DataFrame) -> DataFrame:
        if not metrics:
            return df.observe(name, F.count(F.lit(1)).alias("rows"))
        return df.observe(name, *metrics)

    return _t


# ---------------------------------------------------------------- P11
def lookup_join(
    lookup: DataFrame,
    on: list[str] | Column,
    how: str = "left",
    select_cols: list[str] | None = None,
) -> Transform:
    """Correlated per-row lookup → broadcast hash join.  The reference
    runs one templated SELECT per item (chomper/contrib/sql/
    processors.py:15-49); broadcasting the lookup table turns N
    round-trips into zero shuffles."""
    small = F.broadcast(lookup.select(*select_cols) if select_cols else lookup)
    return lambda df: df.join(small, on=on, how=how)


# ---------------------------------------------------------------- P13
def vectorized_map(schema: str, fn: Callable) -> Transform:
    """Arbitrary custom logic via mapInPandas — Arrow-batched, never
    per-row Python.  ``fn(iter[pd.DataFrame]) -> iter[pd.DataFrame]``
    may fan out 1→N rows (generator-returning pipeline funcs,
    chomper/importers.py:91-95)."""
    return lambda df: df.mapInPandas(fn, schema=schema)


def fanout(explode_col: str | Column, alias: str) -> Transform:
    """Declarative 1→N fan-out (flatMap semantics of generator feeders)."""
    col = F.col(explode_col) if isinstance(explode_col, str) else explode_col
    return lambda df: df.withColumn(alias, F.explode(col))


def assign_surrogate_id(name: str, cols: list[str]) -> Transform:
    """Deterministic surrogate key from identifier columns — the lake
    analogue of E7 insert_get_id/id_field (chomper/contrib/sql/
    exporters.py:164-182).  A DB auto-increment is a serialization
    point; a hash key is partition-parallel, replay-safe, and stable
    across reruns (exactly-once requires it).  60-bit md5 so the DuckDB
    oracle reproduces it."""
    parts = ", ".join(f"cast({c} AS string)" for c in cols)
    expr = (
        f"CAST(conv(substring(md5(concat_ws('#', {parts})), 1, 15), 16, 10) AS BIGINT)"
    )
    return lambda df: df.withColumn(name, F.expr(expr))


def surrogate_id_sql(cols: list[str]) -> str:
    parts = ", ".join(f"cast({c} AS VARCHAR)" for c in cols)
    return f"('0x' || substr(md5(concat_ws('#', {parts})), 1, 15))::BIGINT"


def sessionize(gap_turns: int = 4) -> Transform:
    """Gap-based conversation sessionization: a new session starts when
    the turn index jumps by more than ``gap_turns``.  Two stacked
    windows over the SAME (conv_id ORDER BY turn_idx) partitioning —
    one shuffle, both windows ride it."""

    def _t(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        gap = F.col("turn_idx") - F.lag("turn_idx").over(w)
        is_new = F.when(gap.isNull() | (gap > gap_turns), 1).otherwise(0)
        return df.withColumn(
            "session_id",
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )

    return _t


# ---------------------------------------------------------------- P14
def branch(df: DataFrame, *branches: Iterable[Transform]) -> list[DataFrame]:
    """Multicast one staged DataFrame down several sub-pipelines
    (nested-list pipeline, chomper/importers.py:84-86).  Persist the
    trunk so N consumers scan it once; the caller unpersists."""
    df = df.persist()
    return [pipe(df, *b) for b in branches]
