"""The MERGE apply engine — the heart of the CDC sink.

Reference semantics being reproduced, set-oriented (SURVEY.md §2.3):
  E5 PostgresUpserter — per-row SELECT→UPDATE|INSERT with a documented
     race (chomper/contrib/postgres.py:295-393, race noted :301-302)
  E3 PostgresUpdater  — update-only, no insert-if-missing
     (chomper/contrib/postgres.py:184-259)
  E9 sql Upserter     — .overwrite(False) = update only target-NULL
     columns; .protected() columns never written
     (chomper/contrib/sql/exporters.py:202-322, :239, :50-54)
  E6 change listeners — on_insert / on_update / on_<field>_change
     (chomper/contrib/postgres.py:312-313,395-444)

plus the north rule's delete arm (op='D') and exactly-once.

Physical design (no Iceberg runtime jar in this sandbox — verified —
so the MERGE sink is an interface with a snapshot/manifest fallback
whose semantics match ``MERGE INTO``):

* Table state = hash-bucketed parquet: bucket k holds keys with
  ``pmod(xxhash64(conv_id, turn_idx), n_buckets) = k``.  Bucketing on
  the FULL key (not conv_id alone) is deliberate skew handling: a hot
  conversation's turns spread over all buckets, so no single task
  owns a hot key (north rule: salted-key skew handling — turn_idx is
  the natural salt; see also ``with_salt`` in operators/skew.py).
* A batch touches only the buckets its keys hash to → the merge join
  reads/rewrites just those buckets (Iceberg-style partition pruning);
  untouched buckets are carried forward by manifest reference, never
  rewritten.  At 10^10 rows this is what keeps a micro-batch O(batch),
  not O(table).
* Snapshot isolation + exactly-once: each apply writes a NEW snapshot
  directory and a manifest listing {bucket → data dir, committed batch
  ids, schema}.  The commit is a single atomic rename of the
  ``_CURRENT`` pointer; the batch-id ledger lives INSIDE the manifest,
  so "state updated" and "batch recorded" are one atomic action — a
  replayed/resumed batch is skipped (ledger) and harmless anyway
  (idempotent latest-wins merge keyed on (conv_id, turn_idx, version)).
* Late events: the state carries the applied version (_op_ts,
  _batch_seq) per key and deletes are tombstoned, so an out-of-order
  event arriving in a later batch can never overwrite newer state nor
  resurrect a deleted row.  Replay from ANY checkpoint converges to
  the same final table (global latest-wins order).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from chomper_spark import schema as S
from chomper_spark.operators.dedup import dedup_latest
from chomper_spark.operators.evolve import align_to_schema, evolve_schema

_BUCKET = "_bucket"


@dataclass
class MergeMetrics:
    batch_id: int
    skipped: bool = False
    events_in: int = 0
    dedup_drops: int = 0
    merge_rows: int = 0
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    buckets_touched: int = 0
    field_changes: dict = field(default_factory=dict)
    schema_added: list = field(default_factory=list)
    schema_widened: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def _meta_schema(payload: T.StructType) -> T.StructType:
    """State schema = key+payload columns + version/tombstone metadata."""
    return T.StructType(
        list(payload.fields)
        + [
            T.StructField(S.META_OP_TS, T.TimestampType(), False),
            T.StructField(S.META_BATCH_SEQ, T.LongType(), False),
            T.StructField(S.META_DELETED, T.BooleanType(), False),
        ]
    )


class SnapshotMergeSink:
    """MERGE INTO target USING batch ON key — snapshot/manifest engine.

    Equivalent Iceberg SQL (used verbatim when a MERGE-capable catalog
    is on the classpath — see ``IcebergMergeSink``):

        MERGE INTO target t USING deduped_batch s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND s.op = 'D' AND <s newer> THEN DELETE
        WHEN MATCHED AND <s newer> THEN UPDATE SET ...
        WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ...
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        key_cols: list[str] | None = None,
        version_cols: list[str] | None = None,
        compact_on_write: bool = False,
    ):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.key_cols = key_cols or S.KEY_COLS
        self.version_cols = version_cols or S.VERSION_COLS
        # compact_on_write: add a repartition-by-bucket shuffle before the
        # snapshot write → exactly one file per bucket (best read layout)
        # at the cost of one extra full shuffle per batch.  Off by default:
        # the merge join's own hash partitioning already bounds files per
        # bucket to the shuffle-partition count, and skipping the shuffle
        # is the bigger win at scale.
        self.compact_on_write = compact_on_write
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # ---------------------------------------------------------- manifest io

    def _current_path(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def current_manifest(self) -> dict | None:
        p = self._current_path()
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            name = fh.read().strip()
        with open(os.path.join(self.root, "manifests", name)) as fh:
            return json.load(fh)

    def committed_batches(self) -> set:
        m = self.current_manifest()
        return set(m["committed_batches"]) if m else set()

    def _commit(self, manifest: dict) -> None:
        """Write manifest then atomically flip the _CURRENT pointer.

        The rename is the commit point: state + batch ledger become
        visible together or not at all (exactly-once, crash-safe)."""
        name = f"m{manifest['snapshot_id']:08d}.json"
        mpath = os.path.join(self.root, "manifests", name)
        with open(mpath + ".tmp", "w") as fh:
            json.dump(manifest, fh)
        os.replace(mpath + ".tmp", mpath)
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as fh:
            fh.write(name)
        os.replace(tmp, self._current_path())

    # ------------------------------------------------------------- reading

    def _bucket_expr(self) -> F.Column:
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets)).cast("int")

    def _read_buckets(self, manifest: dict, buckets: list[int]) -> DataFrame | None:
        """Read state rows for the given buckets, aligned to the current
        schema (old snapshot files may predate an evolution)."""
        schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        dfs = []
        for k in buckets:
            rel = manifest["buckets"].get(str(k))
            if rel is None:
                continue
            df = self.spark.read.parquet(os.path.join(self.root, rel))
            dfs.append(align_to_schema(df, schema))
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_state(self) -> DataFrame | None:
        """Full state including tombstones and version metadata.
        None only if the table was never created; an existing empty
        table (e.g. just truncated) reads as an empty DataFrame."""
        m = self.current_manifest()
        if m is None:
            return None
        out = self._read_buckets(m, sorted(int(k) for k in m["buckets"]))
        if out is None:
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            return self.spark.createDataFrame([], schema=schema)
        return out

    def read(self) -> DataFrame | None:
        """User-facing table: live rows, user columns only."""
        st = self.read_state()
        if st is None:
            return None
        return st.filter(~F.col(S.META_DELETED)).drop(*S.META_COLS)

    # ------------------------------------------------------------- merging

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        update_only_nulls: bool = False,
        insert_missing: bool = True,
        protected: tuple[str, ...] = (),
        listen_fields: tuple[str, ...] = (),
        collect_metrics: bool = True,
    ) -> MergeMetrics:
        """Apply one micro-batch of change events. Idempotent.

        ``update_only_nulls`` — E9 .overwrite(False): matched rows only
        fill target-NULL columns.  ``insert_missing=False`` — E3 Updater
        (matched-only).  ``protected`` — E11 columns never updated.
        ``listen_fields`` — E6: count per-field changes on updates.
        """
        metrics = MergeMetrics(batch_id=batch_id)
        manifest = self.current_manifest()
        if manifest and batch_id in set(manifest["committed_batches"]):
            metrics.skipped = True
            return metrics

        payload_schema = T.StructType(
            [f_ for f_ in batch.schema.fields if f_.name not in (S.OP_COL, *self.version_cols, "batch_id")]
        )
        # -- schema evolution against the live table schema
        if manifest:
            cur_state_schema = T.StructType.fromJson(json.loads(manifest["schema"]))
            cur_payload = T.StructType(
                [f_ for f_ in cur_state_schema.fields if f_.name not in S.META_COLS]
            )
            new_payload, report = evolve_schema(cur_payload, payload_schema)
            metrics.schema_added = report.added_columns
            metrics.schema_widened = report.widened_columns
        else:
            new_payload = payload_schema
        state_schema = _meta_schema(new_payload)
        payload_cols = [f_.name for f_ in new_payload.fields]
        data_cols = [c for c in payload_cols if c not in self.key_cols]

        if collect_metrics:
            metrics.events_in = batch.count()

        # -- dedup latest-wins inside the batch (one shuffle on the key)
        src = dedup_latest(batch, self.key_cols, self.version_cols)
        have = set(src.columns)
        proj = [
            F.col(f_.name).cast(f_.dataType).alias(f_.name)
            if f_.name in have
            else F.lit(None).cast(f_.dataType).alias(f_.name)
            for f_ in new_payload.fields
        ]
        src = src.select(
            *proj,
            F.col(S.OP_COL),
            F.col(self.version_cols[0]).alias(S.META_OP_TS),
            F.col(self.version_cols[1]).cast("long").alias(S.META_BATCH_SEQ),
        ).withColumn(_BUCKET, self._bucket_expr())
        src = src.persist()

        # -- bucket pruning: only read/rewrite the buckets this batch touches
        touched = sorted(r[0] for r in src.select(_BUCKET).distinct().collect())
        metrics.buckets_touched = len(touched)
        if collect_metrics:
            metrics.merge_rows = src.count()
            metrics.dedup_drops = metrics.events_in - metrics.merge_rows

        tgt = self._read_buckets(manifest, touched) if manifest else None

        if tgt is None:
            merged = src.select(
                *payload_cols,
                F.col(S.META_OP_TS),
                F.col(S.META_BATCH_SEQ),
                (F.col(S.OP_COL) == "D").alias(S.META_DELETED),
                F.col(_BUCKET),
            )
            if collect_metrics:
                agg = merged.agg(
                    F.sum(F.when(~F.col(S.META_DELETED), 1).otherwise(0)).alias("ins")
                ).collect()[0]
                metrics.inserted = int(agg["ins"] or 0)
        else:
            # align old snapshot files to the EVOLVED schema (new columns
            # NULL-backfill, widened types cast — vectorized, JVM-side)
            tgt = align_to_schema(tgt, state_schema).withColumn(
                _BUCKET, self._bucket_expr()
            )
            t, s = tgt.alias("t"), src.alias("s")
            joined = t.join(s, on=self.key_cols, how="full_outer").persist()

            s_present = F.col(f"s.{S.META_OP_TS}").isNotNull()
            t_present = F.col(f"t.{S.META_OP_TS}").isNotNull()
            s_newer = F.col(f"s.{S.META_OP_TS}") > F.col(f"t.{S.META_OP_TS}")
            s_newer = s_newer | (
                (F.col(f"s.{S.META_OP_TS}") == F.col(f"t.{S.META_OP_TS}"))
                & (F.col(f"s.{S.META_BATCH_SEQ}") > F.col(f"t.{S.META_BATCH_SEQ}"))
            )
            take_src = s_present & (~t_present | s_newer)
            if not insert_missing:
                take_src = take_src & t_present

            def pick(c: str) -> F.Column:
                t_c, s_c = F.col(f"t.{c}"), F.col(f"s.{c}")
                if c in protected:
                    return F.when(t_present, t_c).otherwise(s_c).alias(c)
                if update_only_nulls:
                    # matched & live target: only fill NULLs (E9 overwrite=False)
                    return (
                        F.when(
                            take_src & t_present & ~F.col(f"t.{S.META_DELETED}"),
                            F.coalesce(t_c, s_c),
                        )
                        .when(take_src, s_c)
                        .otherwise(t_c)
                        .alias(c)
                    )
                return F.when(take_src, s_c).otherwise(t_c).alias(c)

            merged = joined.select(
                *self.key_cols,
                *[pick(c) for c in data_cols],
                F.when(take_src, F.col(f"s.{S.META_OP_TS}"))
                .otherwise(F.col(f"t.{S.META_OP_TS}"))
                .alias(S.META_OP_TS),
                F.when(take_src, F.col(f"s.{S.META_BATCH_SEQ}"))
                .otherwise(F.col(f"t.{S.META_BATCH_SEQ}"))
                .alias(S.META_BATCH_SEQ),
                F.when(take_src, F.col(f"s.{S.OP_COL}") == "D")
                .otherwise(F.col(f"t.{S.META_DELETED}"))
                .alias(S.META_DELETED),
                F.coalesce(F.col(f"s.{_BUCKET}"), F.col(f"t.{_BUCKET}")).alias(_BUCKET),
            )
            if not insert_missing:
                merged = merged.filter(F.col(S.META_OP_TS).isNotNull())

            if collect_metrics:
                live_t = t_present & ~F.col(f"t.{S.META_DELETED}")
                aggs = [
                    F.sum(F.when(take_src & ~live_t & (F.col(f"s.{S.OP_COL}") != "D"), 1).otherwise(0)).alias("ins"),
                    F.sum(F.when(take_src & live_t & (F.col(f"s.{S.OP_COL}") != "D"), 1).otherwise(0)).alias("upd"),
                    F.sum(F.when(take_src & live_t & (F.col(f"s.{S.OP_COL}") == "D"), 1).otherwise(0)).alias("del"),
                ] + [
                    F.sum(
                        F.when(
                            take_src & live_t
                            & (F.col(f"s.{S.OP_COL}") != "D")
                            & ~F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}")),
                            1,
                        ).otherwise(0)
                    ).alias(f"chg_{c}")
                    for c in listen_fields
                ]
                row = joined.agg(*aggs).collect()[0]
                metrics.inserted = int(row["ins"] or 0)
                metrics.updated = int(row["upd"] or 0)
                metrics.deleted = int(row["del"] or 0)
                metrics.field_changes = {c: int(row[f"chg_{c}"] or 0) for c in listen_fields}

        # -- write the new snapshot (only touched buckets)
        snap_id = (manifest["snapshot_id"] + 1) if manifest else 0
        rel_data = f"snapshots/s{snap_id:08d}/data"
        out_path = os.path.join(self.root, rel_data)
        merged = align_to_schema(merged, T.StructType(state_schema.fields + [T.StructField(_BUCKET, T.IntegerType(), False)]))
        if self.compact_on_write:
            merged = merged.repartition(min(self.n_buckets, max(1, len(touched))), _BUCKET)
        merged.write.mode("overwrite").partitionBy(_BUCKET).parquet(out_path)
        src.unpersist()
        if tgt is not None:
            joined.unpersist()

        buckets = dict(manifest["buckets"]) if manifest else {}
        for k in touched:
            bucket_dir = os.path.join(out_path, f"{_BUCKET}={k}")
            if os.path.isdir(bucket_dir):
                buckets[str(k)] = f"{rel_data}/{_BUCKET}={k}"
        committed = sorted(set(manifest["committed_batches"]) | {batch_id}) if manifest else [batch_id]
        self._commit(
            {
                "snapshot_id": snap_id,
                "committed_batches": committed,
                "buckets": buckets,
                "schema": json.dumps(state_schema.jsonValue()),
                "key_cols": self.key_cols,
                "n_buckets": self.n_buckets,
            }
        )
        return metrics

    def truncate(self, batch_id: int | None = None) -> None:
        """TRUNCATE (E4 PostgresTruncator, chomper/contrib/postgres.py:262-292;
        E10 sql Truncator, chomper/contrib/sql/exporters.py:325-333):
        atomically flip to an empty snapshot — the full-refresh precursor
        pattern (examples/companies.py:13).  The batch ledger is preserved
        (truncation is table history, not a reset of exactly-once
        tracking); pass ``batch_id`` to make the truncation replay-safe."""
        manifest = self.current_manifest()
        committed = set(manifest["committed_batches"]) if manifest else set()
        if batch_id is not None:
            if batch_id in committed:
                return
            committed.add(batch_id)
        schema = (
            manifest["schema"]
            if manifest
            else json.dumps(_meta_schema(T.StructType(S.TRANSCRIPT.fields)).jsonValue())
        )
        self._commit(
            {
                "snapshot_id": (manifest["snapshot_id"] + 1) if manifest else 0,
                "committed_batches": sorted(committed),
                "buckets": {},
                "schema": schema,
                "key_cols": self.key_cols,
                "n_buckets": self.n_buckets,
            }
        )


def read_table(spark: SparkSession, root: str) -> DataFrame | None:
    """Read the live rows of a SnapshotMergeSink table."""
    return SnapshotMergeSink(spark, root).read()


class IcebergMergeSink:
    """MERGE INTO via a real lakehouse catalog (Iceberg/Delta).

    The sandbox image carries no Iceberg/Delta jars, so this is the
    interface documentation + SQL builder; ``SnapshotMergeSink`` is the
    executable engine with identical semantics.  On a cluster with
    Iceberg on the classpath, apply_batch would run `build_merge_sql`.
    """

    @staticmethod
    def build_merge_sql(target: str, source_view: str, key_cols: list[str], data_cols: list[str]) -> str:
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        newer = "(s.op_ts > t._op_ts OR (s.op_ts = t._op_ts AND s.batch_seq > t._batch_seq))"
        sets = ", ".join(f"t.{c} = s.{c}" for c in data_cols)
        cols = ", ".join(key_cols + data_cols)
        vals = ", ".join(f"s.{c}" for c in key_cols + data_cols)
        return (
            f"MERGE INTO {target} t USING {source_view} s ON {on} "
            f"WHEN MATCHED AND s.op = 'D' AND {newer} THEN DELETE "
            f"WHEN MATCHED AND {newer} THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ({cols}) VALUES ({vals})"
        )
