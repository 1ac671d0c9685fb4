"""Nested field-path transforms — the reference's dotted/indexed path DSL.

The reference's signature data-model feature is path-aware access into
nested items: ``'users[0].address.city'`` parses to
``['users', 0, 'address', 'city']`` and drives get/set/del/exists
(chomper/utils.py:82-148, exercised in examples/fields.py:34-41), plus
dict-field per-key defaults (chomper/processors.py:181-205) and
key-mode Mapper renames inside dict/list fields
(chomper/processors.py:283-316).

Spark-native rebuild: paths compile to ``Column`` expressions —
``getField``/``getItem`` chains for reads, ``withField``/``dropFields``
for struct writes, ``transform`` (with index lambda) for array-element
writes, ``map_filter``/``map_concat``/``transform_keys`` for map
writes.  Everything stays a Catalyst expression (whole-stage codegen,
no shuffle, no Python) — one ``UpdateFields`` node per write, which
the optimizer collapses across chained edits.

Missing-parent semantics match the reference's silent no-op
(chomper/utils.py:109-122): a NULL struct/array parent propagates NULL
through ``withField``/``transform``, so writes under missing parents
change nothing.  A NULL dict **field** being defaulted becomes a dict
of the defaults (chomper/processors.py:202-205) — ``nested_defaults``
reproduces that by materializing the full struct on the NULL branch.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F, types as T

from chomper_spark.operators.transforms import Transform

_IDX_TOKEN = re.compile(r"^\[\d+\]$")

PathKey = str | int


def parse_path(path: str) -> list[PathKey]:
    """``'users[0].address.city'`` → ``['users', 0, 'address', 'city']``
    (the reference's path_split, chomper/utils.py:82-97)."""
    keys: list[PathKey] = []
    for tok in re.split(r"\.|(\[\d+\])", path):
        if not tok:
            continue
        keys.append(int(tok[1:-1]) if _IDX_TOKEN.match(tok) else tok)
    return keys


def get_path(path: str | list[PathKey]) -> Column:
    """Path read as a Column (path_get, chomper/utils.py:100-107).
    Any NULL or missing step along the way yields NULL — the
    reference's miss-is-default semantics.  Array indices go through
    ``F.get`` (NULL on out-of-bounds) because ANSI mode makes
    ``getItem`` THROW on an invalid index."""
    keys = parse_path(path) if isinstance(path, str) else path
    col = F.col(str(keys[0]))
    for k in keys[1:]:
        col = F.get(col, k) if isinstance(k, int) else col.getItem(k)
    return col


def _dtype_at(schema: T.StructType, keys: list[PathKey]) -> T.DataType:
    """Walk the schema to the type at a path."""
    dtype: T.DataType = schema
    for k in keys:
        if isinstance(dtype, T.StructType):
            dtype = dtype[str(k)].dataType
        elif isinstance(dtype, T.ArrayType):
            dtype = dtype.elementType
        elif isinstance(dtype, T.MapType):
            dtype = dtype.valueType
        else:  # pragma: no cover - defensive
            raise TypeError(f"cannot descend into {dtype.simpleString()} at key {k!r}")
    return dtype


def _set(col: Column, dtype: T.DataType, keys: list[PathKey], value: Column) -> Column:
    """Rebuild ``col`` with ``value`` written at ``keys`` (path_set,
    chomper/utils.py:109-122).  NULL parents stay NULL (silent no-op)."""
    k, rest = keys[0], keys[1:]
    if isinstance(dtype, T.StructType):
        k = str(k)
        if not rest:
            return col.withField(k, value)
        sub = dtype[k].dataType
        return col.withField(k, _set(col.getField(k), sub, rest, value))
    if isinstance(dtype, T.ArrayType):
        idx = int(k)
        elem = dtype.elementType
        if not rest:
            return F.transform(col, lambda x, i: F.when(i == idx, value).otherwise(x))
        return F.transform(
            col, lambda x, i: F.when(i == idx, _set(x, elem, rest, value)).otherwise(x)
        )
    if isinstance(dtype, T.MapType):
        if rest:
            raise NotImplementedError(
                "map keys are supported as the FINAL path segment only; "
                "model deeper shapes as structs"
            )
        key = F.lit(k)
        return F.when(col.isNull(), col).otherwise(
            F.map_concat(
                F.map_filter(col, lambda mk, _v: mk != key),
                F.create_map(key, value),
            )
        )
    raise TypeError(f"cannot write into {dtype.simpleString()} at key {k!r}")


def set_path(path: str, value: Column | Callable[[Column], Column] | object) -> Transform:
    """Write ``value`` at a nested path.  ``value`` may be a literal, a
    Column, or a callable receiving the current value at the path."""

    def _t(df: DataFrame) -> DataFrame:
        keys = parse_path(path)
        top = str(keys[0])
        if callable(value) and not isinstance(value, Column):
            val = value(get_path(keys))
        else:
            val = value if isinstance(value, Column) else F.lit(value)
        if len(keys) == 1:
            return df.withColumn(top, val)
        dtype = df.schema[top].dataType
        return df.withColumn(top, _set(F.col(top), dtype, keys[1:], val))

    return _t


def scalar_map_path(path: str, fn: Callable[[Column], Column]) -> Transform:
    """P5 Filter at a nested path (Item.job.company.name.filter(...),
    examples/fields.py:37-40).  NULL input passes through untouched —
    the reference skips None with a warning (chomper/processors.py:262-266)."""
    return set_path(path, lambda c: F.when(c.isNull(), c).otherwise(fn(c)))


def nullify_path(path: str, cond: Column) -> Transform:
    """P4 Dropper(field) at a nested path: conditionally NULL the value."""
    return set_path(path, lambda c: F.when(cond, F.lit(None)).otherwise(c))


def drop_path(path: str) -> Transform:
    """Remove a struct field / map key at a path (path_del,
    chomper/utils.py:125-137).  Array elements cannot be removed
    positionally (fixed schema) — nullify instead."""

    def _t(df: DataFrame) -> DataFrame:
        keys = parse_path(path)
        top = str(keys[0])
        if len(keys) == 1:
            return df.drop(top)
        parent_keys, leaf = keys[1:-1], keys[-1]
        parent_type = _dtype_at(df.schema, [top, *parent_keys])
        if isinstance(parent_type, T.StructType):
            if any(isinstance(k, int) for k in keys[1:]):
                # dropping a struct FIELD of one array element would give
                # that element a different schema than its siblings —
                # impossible (array elements share one type).  Removing a
                # MAP key under an index is fine (schema unchanged) and
                # handled below.
                raise NotImplementedError(
                    "cannot drop a struct field under an array index (array "
                    "elements share one schema) — use nullify_path, or "
                    "rename/drop on the array itself via rename_keys"
                )
            # all-string path: dropFields takes the dotted struct path
            return df.withColumn(
                top, F.col(top).dropFields(".".join(str(k) for k in keys[1:]))
            )
        if isinstance(parent_type, T.MapType):
            key = F.lit(leaf)
            dropped = F.map_filter(
                get_path([top, *parent_keys]) if parent_keys else F.col(top),
                lambda mk, _v: mk != key,
            )
            if not parent_keys:
                return df.withColumn(top, dropped)
            return df.withColumn(
                top, _set(F.col(top), df.schema[top].dataType, parent_keys, dropped)
            )
        raise TypeError(f"cannot drop from {parent_type.simpleString()}")

    return _t


# ------------------------------------------------------------- P1 dict field
def nested_defaults(path: str, defaults: dict) -> Transform:
    """Per-key defaults inside a struct/map field (the reference's
    dict-field Defaulter, chomper/processors.py:181-205): only missing
    or NULL keys are filled, falsy values kept; a NULL field becomes a
    struct/map of the defaults.  New struct keys are appended."""

    def _lit(v) -> Column:
        return v if isinstance(v, Column) else F.lit(v)

    def _t(df: DataFrame) -> DataFrame:
        keys = parse_path(path)
        top = str(keys[0])
        dtype = _dtype_at(df.schema, keys)
        col = get_path(keys)

        if isinstance(dtype, T.StructType):
            existing = {f_.name for f_ in dtype.fields}
            if any(isinstance(k, int) for k in keys[1:]) and any(
                k not in existing for k in defaults
            ):
                # appending a NEW struct field to one array element would
                # diverge its schema from its siblings — impossible
                raise NotImplementedError(
                    "cannot append new struct keys under an array index "
                    "(array elements share one schema) — default only "
                    "existing keys there, or restructure as a map"
                )
            filled = col
            for k, v in defaults.items():
                filled = (
                    filled.withField(k, F.coalesce(col.getField(k), _lit(v)))
                    if k in existing
                    else filled.withField(k, _lit(v))
                )
            # NULL dict field → dict of the defaults (processors.py:202-205)
            null_fields = [
                (_lit(defaults[f_.name]) if f_.name in defaults else F.lit(None))
                .cast(f_.dataType)
                .alias(f_.name)
                for f_ in dtype.fields
            ] + [
                _lit(v).alias(k) for k, v in defaults.items() if k not in existing
            ]
            out = F.when(col.isNull(), F.struct(*null_fields)).otherwise(filled)
        elif isinstance(dtype, T.MapType):
            base = F.coalesce(col, F.create_map().cast(dtype))
            dkeys = [F.lit(k) for k in defaults]
            dmap = F.create_map(
                *[x for k, v in defaults.items() for x in (F.lit(k), _lit(v))]
            ).cast(dtype)
            kept = F.map_filter(
                base, lambda mk, mv: mv.isNotNull() | ~mk.isin(*dkeys)
            )
            additions = F.map_filter(
                dmap, lambda mk, _v: F.element_at(base, mk).isNull()
            )
            out = F.map_concat(kept, additions)
        else:
            raise TypeError(
                f"nested_defaults needs a struct/map at {path!r}, "
                f"got {dtype.simpleString()}"
            )

        if len(keys) == 1:
            return df.withColumn(top, out)
        return df.withColumn(
            top, _set(F.col(top), df.schema[top].dataType, keys[1:], out)
        )

    return _t


# --------------------------------------------------------------- P7 key mode
def _rename_struct(col: Column, dtype: T.StructType, mapping: dict[str, str]) -> Column:
    new_type = T.StructType(
        [
            T.StructField(mapping.get(f_.name, f_.name), f_.dataType, f_.nullable)
            for f_ in dtype.fields
        ]
    )
    built = F.struct(
        *[
            col.getField(f_.name).alias(mapping.get(f_.name, f_.name))
            for f_ in dtype.fields
        ]
    )
    return F.when(col.isNull(), F.lit(None).cast(new_type)).otherwise(built)


def rename_keys(path: str, mapping: dict[str, str]) -> Transform:
    """Rename keys INSIDE a nested field (key-mode Mapper on dict/list
    fields, chomper/processors.py:302-316): struct fields are renamed
    (schema change), map keys remapped, and an array-of-structs renames
    every element.  Unmapped keys pass through; mapping onto an
    existing key is the caller's responsibility (the reference
    overwrites)."""

    def _rename(col: Column, dtype: T.DataType) -> Column:
        if isinstance(dtype, T.StructType):
            return _rename_struct(col, dtype, mapping)
        if isinstance(dtype, T.MapType):
            m = F.create_map(
                *[x for k, v in mapping.items() for x in (F.lit(k), F.lit(v))]
            )
            return F.transform_keys(
                col, lambda k, _v: F.coalesce(F.element_at(m, k), k)
            )
        if isinstance(dtype, T.ArrayType):
            return F.transform(col, lambda x: _rename(x, dtype.elementType))
        raise TypeError(f"rename_keys needs struct/map/array at {path!r}")

    def _t(df: DataFrame) -> DataFrame:
        keys = parse_path(path)
        top = str(keys[0])
        dtype = _dtype_at(df.schema, keys)
        out = _rename(get_path(keys), dtype)
        if len(keys) == 1:
            return df.withColumn(top, out)
        return df.withColumn(
            top, _set(F.col(top), df.schema[top].dataType, keys[1:], out)
        )

    return _t


def for_fields(paths: list[str], fn: Callable[[Column], Column]) -> Transform:
    """Selector multi-field routing (chomper/items.py:244-273): apply
    one scalar transform to several fields/paths in a single Transform
    — ``Processor(selector=[Item.a, Item.b.c])``.  Each path gets the
    NULL-skip semantics of scalar_map_path; the edits fuse into one
    projection (Catalyst collapses consecutive UpdateFields)."""

    def _t(df: DataFrame) -> DataFrame:
        for p in paths:
            df = scalar_map_path(p, fn)(df)
        return df

    return _t


def path_exists(path: str) -> Column:
    """Boolean Column: the value at the path is non-NULL (path_exists,
    chomper/utils.py:140-148 — schema presence is static in Spark, so
    runtime existence means non-NULL)."""
    return get_path(path).isNotNull()
