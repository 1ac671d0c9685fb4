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
  ``pmod(xxhash64(cast(conv_id as string), cast(turn_idx as string)),
  n_buckets) = k`` (canonical string form — widen-stable).  Bucketing on
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
  directory and commits a manifest — normally a DELTA manifest carrying
  only the touched buckets' map entries (O(batch)), checkpointed to a
  full manifest every _CHECKPOINT_EVERY commits so opening the table
  folds a bounded chain.  The commit is a single atomic rename of the
  ``_CURRENT`` pointer; the batch-id ledger lives INSIDE the manifest
  as a contiguous high-watermark + bounded out-of-order set (never the
  full id list — a years-long stream commits 10^5-10^6 batches), so
  "state updated" and "batch recorded" are one atomic action — a
  replayed/resumed batch is skipped (ledger) and harmless anyway
  (idempotent latest-wins merge keyed on (conv_id, turn_idx, version)).
* Late events: the state carries the applied version (_op_ts,
  _batch_seq) per key and deletes are tombstoned, so an out-of-order
  event arriving in a later batch can never overwrite newer state nor
  resurrect a deleted row.  Replay from ANY checkpoint converges to
  the same final table (global latest-wins order).
"""

from __future__ import annotations

import itertools
import json
import os
import re
import tempfile
from dataclasses import dataclass, field

from py4j.protocol import Py4JJavaError
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from chomper_spark import schema as S
from chomper_spark.operators.dedup import dedup_latest_agg
from chomper_spark.operators.evolve import align_to_schema, evolve_schema

_BUCKET = "_bucket"
_MANIFEST_RE = re.compile(r"^m\d{8}\.json$")
_SNAP_RE = re.compile(r"snapshots/s(\d{8})/")
_SNAP_DIR_RE = re.compile(r"^s(\d{8})$")
_COMMIT_RETRIES = 5


class CommitConflictError(RuntimeError):
    """Another writer committed the same chain position first.  The
    loser's work (data files under its claimed snapshot dir) is
    unreferenced garbage; the public entry points (apply_batch,
    compact, truncate) re-read HEAD and retry against the new parent —
    raised to callers only after ``_COMMIT_RETRIES`` straight losses."""


def _schema_for_rel(history: list[dict], rel: str) -> str:
    """The schema (JSON text) a data file carries, derived from the
    snapshot id embedded in its path: the newest ``schema_history``
    entry whose ``from_snapshot`` ≤ the file's snapshot.  No per-file
    metadata needed — a file always carries the schema that was
    current when its snapshot was written."""
    sid = int(_SNAP_RE.search(rel).group(1))
    cur = history[0]["schema"]
    for h in history:
        if h["from_snapshot"] <= sid:
            cur = h["schema"]
        else:
            break
    return cur

# Commit-metadata bounds (round 4).  A continuous stream commits one
# snapshot per micro-batch for years — 10^5-10^6 commits over 10^4-10^6
# buckets at the design point — so nothing written PER COMMIT may be
# proportional to table history or table width:
#   * the batch-id ledger is a contiguous high-watermark plus a bounded
#     out-of-order set (foreachBatch epochs are contiguous, so the set
#     is empty in steady state), never the full id list;
#   * a normal commit writes a DELTA manifest carrying only the touched
#     buckets' map entries (O(batch)); every _CHECKPOINT_EVERY commits
#     a full checkpoint manifest bounds the fold chain, so opening a
#     table reads ≤ _CHECKPOINT_EVERY small files + one checkpoint
#     (Iceberg's snapshot/manifest-list split, file-system flavored).
_CHECKPOINT_EVERY = 16
# sanity bound for pathological non-contiguous batch-id use (manual
# callers skipping ids); contiguous streaming never grows the set.
_RECENT_MAX = 100_000
# Checkpoint SHARDING (round 5): a checkpoint's bucket/delta maps are
# O(table width), so on a wide table every 16th commit wrote a
# multi-MB manifest (amortized O(width/16) bytes per commit).  Wide
# tables (n_buckets >= _SHARD_MIN_BUCKETS) now split those maps into
# per-bucket-range shard files of _SHARD_SIZE buckets each; a
# checkpoint rewrites ONLY the shards containing buckets touched since
# the previous checkpoint and carries the rest forward by file
# reference — Iceberg's manifest-list/manifest split, file-system
# flavored.  Per-checkpoint bytes = O(touched shards) + the shard map
# (O(width/_SHARD_SIZE) ~30-byte entries), so per-commit manifest
# bytes are bounded by the batch's locality, not the table width.
_SHARD_SIZE = 256
_SHARD_MIN_BUCKETS = 1024
_SHARD_SEQ = itertools.count()


def _ledger_contains(manifest: dict | None, batch_id: int) -> bool:
    """Exactly-once skip check against the bounded ledger — O(recent),
    not O(all batches ever committed)."""
    if manifest is None:
        return False
    if "batch_watermark" in manifest:
        return batch_id <= manifest["batch_watermark"] or batch_id in set(
            manifest.get("recent_batches", ())
        )
    # raw v1 manifest (pre-fold); normalize_full usually precedes this
    return batch_id in set(manifest.get("committed_batches", ()))


def _ledger_add(manifest: dict | None, batch_id: int) -> tuple[int, list[int]]:
    """New (watermark, recent) after committing ``batch_id``: the
    watermark advances through any now-contiguous prefix, so recent
    stays empty under in-order epochs."""
    wm = manifest["batch_watermark"] if manifest else -1
    recent = set(manifest.get("recent_batches", ())) if manifest else set()
    recent.add(batch_id)
    while wm + 1 in recent:
        wm += 1
        recent.discard(wm)
    if len(recent) > _RECENT_MAX:
        raise ValueError(
            f"batch-id ledger out-of-order set exceeded {_RECENT_MAX} ids "
            f"(watermark {wm}); use contiguous batch ids"
        )
    return wm, sorted(recent)


def _normalize_full(raw: dict) -> dict:
    """A checkpoint manifest as the fold base.  v1 manifests (round ≤3)
    carried the full ``committed_batches`` list — contract it to the
    bounded watermark+recent form once, at read."""
    if "batch_watermark" not in raw:
        ids = set(raw.get("committed_batches", ()))
        wm = -1
        while wm + 1 in ids:
            wm += 1
        raw["batch_watermark"] = wm
        raw["recent_batches"] = sorted(i for i in ids if i > wm)
    raw.setdefault("deltas", {})
    raw.setdefault("chain_len", 0)
    # pre-round-5 tables bucketed on the full key
    if "key_cols" in raw:
        raw.setdefault("bucket_cols", list(raw["key_cols"]))
    # tables from before metadata-only evolution always rewrote every
    # file on evolution, so all their files carry the current schema
    raw.setdefault(
        "schema_history", [{"from_snapshot": 0, "schema": raw["schema"]}]
    )
    return raw


def _apply_manifest_delta(base: dict, d: dict) -> dict:
    """Fold one delta manifest onto a resolved base.  Copies the maps
    it edits so a cached base is never aliased."""
    out = dict(base)
    for k in ("snapshot_id", "batch_watermark", "recent_batches",
              "schema", "key_cols", "n_buckets", "chain_len"):
        out[k] = d[k]
    if "bucket_cols" in d:  # absent in pre-round-5 delta manifests
        out["bucket_cols"] = d["bucket_cols"]
    if "schema_history" in d:  # present only on evolution commits
        out["schema_history"] = d["schema_history"]
    buckets = dict(base.get("buckets", {}))
    buckets.update(d.get("bucket_updates", {}))
    for k in d.get("bucket_removals", ()):
        buckets.pop(k, None)
    out["buckets"] = buckets
    deltas = {k: list(v) for k, v in base.get("deltas", {}).items()}
    deltas.update({k: list(v) for k, v in d.get("delta_sets", {}).items()})
    for k in d.get("delta_removals", ()):
        deltas.pop(k, None)
    out["deltas"] = deltas
    # shard bookkeeping: which buckets changed since the base
    # checkpoint (drives which shard files the NEXT checkpoint must
    # rewrite), and the base's shard map (what it can reuse)
    dirty = set(base.get("_dirty_buckets", ()))
    dirty.update(d.get("bucket_updates", {}))
    dirty.update(d.get("bucket_removals", ()))
    dirty.update(d.get("delta_sets", {}))
    dirty.update(d.get("delta_removals", ()))
    out["_dirty_buckets"] = dirty
    out["_shard_map"] = dict(base.get("_shard_map", {}))
    if "changes" in base or d.get("changes_updates"):
        changes = dict(base.get("changes", {}))
        changes.update(d.get("changes_updates", {}))
        out["changes"] = changes
    return out


def _obs_row(obs) -> dict:
    """Read an Observation's metrics, tolerating elimination: when a
    batch is a statically-empty relation, PropagateEmptyRelation
    rewrites the subtree and the CollectMetrics node never fires —
    the true counts are then all zero, surfaced as a Py4J-wrapped
    ``java.lang.AssertionError`` from Observation.get.  ONLY that error
    is mapped to {}; anything else (listener failure, network, a future
    API change) propagates — the counters are the Importer's contract,
    so a silent 0 would misreport dropped rows as applied."""
    try:
        return dict(obs.get)
    except Py4JJavaError as e:
        if "java.lang.AssertionError" in str(e):
            return {}
        raise


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


def _meta_schema(payload: T.StructType, audit: bool = False) -> T.StructType:
    """State schema = key+payload columns [+ audit timestamps]
    + version/tombstone metadata."""
    audit_fields = (
        [
            T.StructField(S.AUDIT_CREATED, T.TimestampType(), True),
            T.StructField(S.AUDIT_UPDATED, T.TimestampType(), True),
        ]
        if audit
        else []
    )
    return T.StructType(
        list(payload.fields)
        + audit_fields
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
        compact_on_write: bool = True,
        write_mode: str = "cow",
        mor_compact_threshold: int = 8,
        audit_timestamps: bool = False,
        bucket_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.key_cols = key_cols or S.KEY_COLS
        self.version_cols = version_cols or S.VERSION_COLS
        # bucket_cols: the key-column PREFIX/subset rows are physically
        # bucketed by (default: the full key).  Bucketing on a subset is
        # merge-correct — every row of a key still lands in one bucket —
        # and lets probe-side pruning use partial keys: an index table
        # keyed (band_idx, band_val, doc_id) but bucketed on
        # (band_idx, band_val) supports read_prune_for() with just the
        # band columns, so a micro-batch probes only the buckets its
        # band hashes land in instead of scanning/shuffling the corpus.
        self.bucket_cols = list(bucket_cols) if bucket_cols else list(self.key_cols)
        if not set(self.bucket_cols) <= set(self.key_cols):
            raise ValueError(
                f"bucket_cols {self.bucket_cols} must be a subset of "
                f"key_cols {self.key_cols}"
            )
        # audit_timestamps: E9 .timestamps() (chomper/contrib/sql/
        # exporters.py:110-145, tests/test_sql.py:116-128) — created_at
        # set when a key's state row first materializes, updated_at
        # advanced on every applied change; both parameterized by the
        # apply_batch(batch_time=...) argument, never current_timestamp()
        # (replay must be deterministic).  Needs the pre-image → COW only.
        self.audit_timestamps = audit_timestamps
        # compact_on_write: repartition by bucket before the snapshot write
        # → exactly one file per bucket.  Measured 4× faster end-to-end than
        # skipping the shuffle: without it every shuffle task writes a file
        # into every bucket dir (tasks × buckets small files per snapshot),
        # and file-creation/listing overhead dwarfs one narrow shuffle of
        # the touched buckets.  Off only for write-once append patterns.
        self.compact_on_write = compact_on_write
        # write_mode:
        #   "cow" (copy-on-write): each batch full-outer-joins the touched
        #     buckets and rewrites them — reads are a plain scan, but every
        #     batch writes O(touched table).  Matches Iceberg COW MERGE.
        #   "mor" (merge-on-read): each batch APPENDS a per-bucket delta
        #     file (O(batch) write — the only shape that holds at 10^10
        #     events) and reads reduce base+deltas latest-wins; delta
        #     chains longer than ``mor_compact_threshold`` fold into a new
        #     base inline (amortized rewrites).  Matches Iceberg/Hudi MOR.
        #     Modes needing the pre-image at write time (update_only_nulls,
        #     insert_missing=False, protected, listen_fields, per-op
        #     metrics) require "cow".
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        self.write_mode = write_mode
        self.mor_compact_threshold = mor_compact_threshold
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        # n_buckets and key_cols are TABLE properties, recorded in the
        # manifest at creation: every existing row's location is a
        # function of them, so honoring a different constructor value on
        # an existing table would orphan all current state (e.g. a
        # maintenance compact() re-hashing into dirs the manifest never
        # references — silent data loss).  Re-bucketing/re-keying needs
        # an explicit full rewrite, not a config change; until that
        # exists, the on-disk values win.
        m = self.current_manifest()
        if m is not None:
            self.n_buckets = int(m.get("n_buckets", self.n_buckets))
            self.key_cols = list(m.get("key_cols", self.key_cols))
            self.bucket_cols = list(m.get("bucket_cols", self.key_cols))

    # ---------------------------------------------------------- manifest io

    def _current_path(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def _current_name(self) -> str | None:
        """HEAD manifest name.  ``_CURRENT`` is a fast HINT, not the
        commit point: the commit point is the exclusive-create of the
        sequence-numbered manifest file itself (see ``_write_manifest``),
        so after reading the hint we probe FORWARD for higher-numbered
        manifests — commit ids are contiguous (CAS forces every commit
        to be parent+1), so the probe walks at most the number of
        commits since the hint was last flipped (normally 0; >0 only
        when racing another writer or after a crash between link and
        flip)."""
        p = self._current_path()
        if not os.path.exists(p):
            # bootstrap race/crash window: m00000000.json linked but
            # _CURRENT never flipped
            if os.path.exists(os.path.join(self.root, "manifests", "m00000000.json")):
                name = "m00000000.json"
            else:
                return None
        else:
            with open(p) as fh:
                name = fh.read().strip()
        sid = int(name[1:9])
        while os.path.exists(
            os.path.join(self.root, "manifests", f"m{sid + 1:08d}.json")
        ):
            sid += 1
        return f"m{sid:08d}.json"

    def _load_raw(self, name: str) -> dict:
        with open(os.path.join(self.root, "manifests", name)) as fh:
            return json.load(fh)

    def _fold_by_name(self, name: str) -> dict:
        """Resolve a manifest name to the FULL logical manifest, folding
        its delta chain onto the nearest checkpoint (≤ _CHECKPOINT_EVERY
        file reads; one cached fold makes the steady-state cost O(1)
        per commit).  The folded dict carries ``_name`` for delta-commit
        parent linkage; it is never written to disk."""
        cached = getattr(self, "_fold_cache", None)
        if cached and cached[0] == name:
            return cached[1]
        chain: list[dict] = []
        cur = name
        while True:
            if cached and cached[0] == cur:
                base = cached[1]
                break
            raw = self._load_raw(cur)
            if not raw.get("delta"):
                base = self._expand_checkpoint(_normalize_full(raw))
                break
            chain.append(raw)
            cur = raw["parent"]
        for d in reversed(chain):
            base = _apply_manifest_delta(base, d)
        base["_name"] = name
        self._fold_cache = (name, base)
        return base

    def current_manifest(self) -> dict | None:
        """Folded HEAD.  Retries on a vanished ancestor: a concurrent
        ``expire_snapshots`` may rewrite kept delta manifests in place
        as self-contained checkpoints and then DELETE their ancestors —
        a fold walk that started just before loses the parent file
        mid-chain.  The rewrite lands before any deletion, so re-reading
        HEAD always folds cleanly; bounded retries make the reader/
        writer side of GC concurrency-safe to match the commit CAS."""
        for _ in range(_COMMIT_RETRIES):
            name = self._current_name()
            if name is None:
                return None
            try:
                return self._fold_by_name(name)
            except FileNotFoundError:
                self._fold_cache = None
                continue
        return self._fold_by_name(self._current_name())

    def committed_batches(self) -> set:
        """Diagnostic helper (tests / small tables): MATERIALIZES the
        committed-id set from the bounded watermark+recent ledger —
        O(watermark), so never call it on a long-lived production
        table; use ``_ledger_contains`` for membership."""
        m = self.current_manifest()
        if m is None:
            return set()
        return set(range(m["batch_watermark"] + 1)) | set(m.get("recent_batches", ()))

    def _write_manifest(self, doc: dict) -> str:
        """Publish a manifest with a compare-and-swap.

        The manifest's full content is written to a temp file, then
        ``os.link``ed to its sequence-numbered name — an ATOMIC
        exclusive-create that carries complete content (no reader can
        observe a half-written manifest, no two writers can both own
        one chain position).  That link IS the commit point: state +
        batch ledger become visible together or not at all.  A second
        writer racing for the same position gets ``FileExistsError`` →
        ``CommitConflictError``; the public entry points re-read HEAD
        and retry against the new parent, so concurrent streaming
        apply + maintenance compaction can never silently clobber each
        other's commits (last-wins ``os.replace`` did exactly that
        before round 5).  The ``_CURRENT`` flip afterwards is only a
        read hint — ``_current_name`` probes forward past it."""
        name = f"m{doc['snapshot_id']:08d}.json"
        mpath = os.path.join(self.root, "manifests", name)
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "manifests"),
                                   suffix=".inflight")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(doc, fh)
            try:
                os.link(tmp, mpath)
            except FileExistsError:
                raise CommitConflictError(
                    f"manifest {name} already committed by another writer"
                ) from None
        finally:
            os.unlink(tmp)
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as fh:
            fh.write(name)
        os.replace(tmp, self._current_path())
        return name

    def _claim_snapshot_dir(self) -> tuple[int, str]:
        """Claim a UNIQUE snapshot data directory via exclusive mkdir —
        concurrent writers each write their data under their own claim,
        so a pre-commit Spark overwrite can never clobber files a
        racing winner's manifest references.  Ids are claimed above the
        max existing dir id, so committed dir ids stay monotone with
        commit order (``_schema_for_rel`` relies on that to map a
        file's path to its schema epoch); a loser's abandoned claim is
        unreferenced garbage for ``expire_snapshots``.  The dir id can
        therefore run AHEAD of the manifest's commit id — they are
        decoupled on purpose."""
        sdir = os.path.join(self.root, "snapshots")
        # the directory listing runs once per sink instance; afterwards
        # the cursor advances in memory, so a long-running stream pays
        # O(1) per commit instead of O(#snapshot dirs) (the mkdir loop
        # still resolves any collision with another process's claims)
        nxt = getattr(self, "_claim_cursor", None)
        if nxt is None:
            nxt = (
                max(
                    (
                        int(m.group(1))
                        for d in os.listdir(sdir)
                        if (m := _SNAP_DIR_RE.match(d))
                    ),
                    default=-1,
                )
                + 1
            )
        while True:
            path = os.path.join(sdir, f"s{nxt:08d}")
            try:
                os.mkdir(path)
                self._claim_cursor = nxt + 1
                return nxt, path
            except FileExistsError:
                nxt += 1

    def _expand_checkpoint(self, base: dict) -> dict:
        """Materialize a checkpoint's bucket/delta maps: sharded
        checkpoints (wide tables) load their referenced shard files;
        inline checkpoints pass through.  Either way the folded state
        starts with an empty dirty set and the checkpoint's shard map."""
        if "bucket_shards" in base:
            buckets: dict[str, str] = {}
            deltas: dict[str, list] = {}
            for rel in base["bucket_shards"].values():
                with open(os.path.join(self.root, "manifests", rel)) as fh:
                    sh = json.load(fh)
                buckets.update(sh.get("buckets", {}))
                deltas.update(sh.get("deltas", {}))
            base["buckets"] = buckets
            base["deltas"] = deltas
            # keep shard linkage only in the private bookkeeping key —
            # a folded dict later passed as a checkpoint's new_full must
            # not leak a stale on-disk shard map
            base["_shard_map"] = dict(base.pop("bucket_shards"))
        else:
            base["_shard_map"] = {}
        base["_dirty_buckets"] = set()
        return base

    def _maybe_shard_checkpoint(
        self,
        doc: dict,
        new_full: dict,
        prev_map: dict,
        dirty_keys: set | None,
    ) -> None:
        """On wide tables, move a checkpoint ``doc``'s bucket/delta
        maps into per-range shard files, rewriting ONLY the shards
        containing ``dirty_keys`` (None = unknown → rewrite all) and
        carrying clean shards forward from ``prev_map`` by reference.
        Mutates ``doc`` (and ``new_full``'s shard bookkeeping)."""
        if int(new_full["n_buckets"]) < _SHARD_MIN_BUCKETS:
            new_full["_shard_map"] = {}
            new_full["_dirty_buckets"] = set()
            return
        n_shards = -(-int(new_full["n_buckets"]) // _SHARD_SIZE)
        if not prev_map or dirty_keys is None:
            dirty_shards = set(range(n_shards))
        else:
            dirty_shards = {int(k) // _SHARD_SIZE for k in dirty_keys}
        shard_map = {
            s: rel for s, rel in prev_map.items() if int(s) not in dirty_shards
        }
        sdir = os.path.join(self.root, "manifests", "shards")
        os.makedirs(sdir, exist_ok=True)
        buckets = new_full.get("buckets", {})
        deltas = new_full.get("deltas", {})
        by_shard: dict[int, dict] = {}
        for k, v in buckets.items():
            s = int(k) // _SHARD_SIZE
            if s in dirty_shards:
                by_shard.setdefault(s, {"buckets": {}, "deltas": {}})["buckets"][k] = v
        for k, v in deltas.items():
            s = int(k) // _SHARD_SIZE
            if s in dirty_shards:
                by_shard.setdefault(s, {"buckets": {}, "deltas": {}})["deltas"][k] = v
        for s, content in sorted(by_shard.items()):
            # name must be unique across concurrent writers racing the
            # same commit position (pid) and across same-process
            # retries/instances (module counter) — a loser's file must
            # never overwrite one a winner's manifest references
            fname = (
                f"c{doc['snapshot_id']:08d}_{s}_{os.getpid()}_"
                f"{next(_SHARD_SEQ)}.json"
            )
            with open(os.path.join(sdir, fname), "w") as fh:
                json.dump(content, fh)
            shard_map[str(s)] = f"shards/{fname}"
        doc.pop("buckets", None)
        doc.pop("deltas", None)
        doc["bucket_shards"] = shard_map
        new_full["_shard_map"] = dict(shard_map)
        new_full["_dirty_buckets"] = set()

    def _commit(
        self,
        new_full: dict,
        parent: dict | None = None,
        delta_doc: dict | None = None,
        force_full: bool = False,
        touched_keys: set | None = None,
    ) -> None:
        """Commit ``new_full`` (the complete logical manifest).

        With a ``delta_doc`` and an eligible parent, only the delta —
        O(touched buckets) — is written; every _CHECKPOINT_EVERY
        commits, and for every full-rewrite operation (truncate,
        compact, schema evolution, legacy-v1 upgrade), a checkpoint is
        written instead.  Either way the in-memory folded state is
        installed into the fold cache, so the next ``apply_batch``
        re-reads nothing."""
        chain_len = 0 if parent is None else parent.get("chain_len", 0) + 1
        as_delta = (
            not force_full
            and delta_doc is not None
            and parent is not None
            and parent.get("_name")
            and chain_len <= _CHECKPOINT_EVERY
        )
        # keys this commit touches (for shard dirtiness): derivable from
        # the delta_doc when present, else supplied by maintenance ops
        if delta_doc is not None and touched_keys is None:
            touched_keys = set()
            touched_keys.update(delta_doc.get("bucket_updates", {}))
            touched_keys.update(delta_doc.get("bucket_removals", ()))
            touched_keys.update(delta_doc.get("delta_sets", {}))
            touched_keys.update(delta_doc.get("delta_removals", ()))
        if as_delta:
            doc = {
                "format": 2,
                "delta": True,
                "parent": parent["_name"],
                "chain_len": chain_len,
                **{
                    k: new_full[k]
                    for k in (
                        "snapshot_id", "batch_watermark", "recent_batches",
                        "schema", "key_cols", "bucket_cols", "n_buckets",
                    )
                },
                **delta_doc,
            }
            new_full["_shard_map"] = dict(parent.get("_shard_map", {}))
            new_full["_dirty_buckets"] = (
                set(parent.get("_dirty_buckets", ())) | touched_keys
            )
        else:
            chain_len = 0
            # overrides AFTER the spread so a chain_len/delta/parent key
            # in new_full (e.g. a caller passing a folded manifest) can
            # never leak into a checkpoint
            doc = {
                **{k: v for k, v in new_full.items() if not k.startswith("_")},
                "format": 2,
                "chain_len": 0,
            }
            doc.pop("delta", None)
            doc.pop("parent", None)
            doc.pop("bucket_shards", None)
            dirty = (
                set(parent.get("_dirty_buckets", ())) | touched_keys
                if parent is not None and touched_keys is not None
                else None
            )
            self._maybe_shard_checkpoint(
                doc, new_full,
                dict(parent.get("_shard_map", {})) if parent else {},
                dirty,
            )
        name = self._write_manifest(doc)
        new_full["chain_len"] = chain_len
        new_full["_name"] = name
        self._fold_cache = (name, new_full)

    def _next_schema_history(
        self, manifest: dict | None, evolved: bool, snap_id: int, schema_json: str
    ) -> list[dict]:
        """schema_history for the next commit: append an entry only on
        evolution (bounded by the number of evolutions ever, not by
        commits)."""
        if manifest is None:
            return [{"from_snapshot": snap_id, "schema": schema_json}]
        history = list(
            manifest.get("schema_history")
            or [{"from_snapshot": 0, "schema": manifest["schema"]}]
        )
        if evolved:
            history.append({"from_snapshot": snap_id, "schema": schema_json})
        return history

    # ------------------------------------------------------------- reading

    def _bucket_expr(self) -> F.Column:
        # hash the CANONICAL STRING form of each key column: xxhash64 is
        # type-sensitive (hash(0::int) != hash(0::long)), so hashing raw
        # values would relocate every key when a key column is widened —
        # orphaning/duplicating state.  String form is widen-stable.
        return F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in self.bucket_cols]),
            F.lit(self.n_buckets),
        ).cast("int")

    def _read_buckets(self, manifest: dict, buckets: list[int]) -> DataFrame | None:
        """Read state rows for the given buckets in ONE parquet scan
        per live SCHEMA VERSION (plus one more per version when shared
        small-batch deltas exist) — in steady state exactly one.

        A single multi-path relation (not a union of per-bucket reads —
        N separate relations make planning and listing O(N) per batch).
        Schema evolution is METADATA-ONLY (round 4): an ADD COLUMN /
        type-widen commit touches just its own batch's buckets, so live
        files may carry an older schema.  Each file's schema is derived
        from the snapshot id in its path via the manifest's
        ``schema_history`` (``_schema_for_rel``); files are grouped by
        version, each group scans with ITS exact schema and is aligned
        to the current one with vectorized NULL-backfill/casts
        (``align_to_schema``) before the union.  Compaction rewrites
        lazily fold old versions away (``compact(upgrade_schema=True)``
        forces it), so the group count trends back to one.

        Shared deltas (``delta_layout="single"``, one file holding many
        buckets' rows with the bucket id as a DATA column) are read
        separately, filtered PER FILE to the requested buckets whose
        chains actually reference that file, and unioned.  The
        per-file grain matters after partial compaction: a shared file
        can hold bucket k's rows while only bucket j's chain still
        references it (k's chain was folded into a base) — admitting
        k's rows from it would re-read folded data.  The latest-wins
        reduce would still dedup them against the newer base row, but
        the read should not depend on that."""
        cur_json = manifest["schema"]
        schema = T.StructType.fromJson(json.loads(cur_json))
        history = manifest.get(
            "schema_history", [{"from_snapshot": 0, "schema": cur_json}]
        )
        multi_version = len({h["schema"] for h in history}) > 1

        def rel_schema(rel: str) -> str:
            return _schema_for_rel(history, rel) if multi_version else cur_json

        deltas = manifest.get("deltas", {})
        has_delta = False
        by_schema: dict[str, list[str]] = {}  # schema json → rel paths
        shared: dict[str, set[int]] = {}  # shared rel path → referencing buckets
        for k in buckets:
            rel = manifest["buckets"].get(str(k))
            if rel is not None:
                by_schema.setdefault(rel_schema(rel), []).append(rel)
            for d in deltas.get(str(k), ()):
                if d.endswith("/delta_shared"):
                    shared.setdefault(d, set()).add(int(k))
                else:
                    by_schema.setdefault(rel_schema(d), []).append(d)
                has_delta = True
        parts = []
        for sjson, rels in sorted(by_schema.items()):
            grp = self.spark.read.schema(
                T.StructType.fromJson(json.loads(sjson))
            ).parquet(*[os.path.join(self.root, r) for r in rels])
            parts.append(grp if sjson == cur_json else align_to_schema(grp, schema))
        shared_by_schema: dict[str, dict[str, set[int]]] = {}
        for d, refs in shared.items():
            shared_by_schema.setdefault(rel_schema(d), {})[d] = refs
        for sjson, grp_shared in sorted(shared_by_schema.items()):
            file_schema = T.StructType.fromJson(json.loads(sjson))
            shared_schema = T.StructType(
                file_schema.fields + [T.StructField(_BUCKET, T.IntegerType(), True)]
            )
            sdf = self.spark.read.schema(shared_schema).parquet(
                *[os.path.join(self.root, d) for d in sorted(grp_shared)]
            )
            allowed_sets = {frozenset(v) for v in grp_shared.values()}
            if len(allowed_sets) == 1:
                # common case: every shared file serves the same subset
                cond = F.col(_BUCKET).isin(sorted(next(iter(allowed_sets))))
            else:
                # mixed referencing sets → per-file condition keyed on
                # the snapshot dir embedded in the file path (each
                # shared file lives in snapshots/s<id>/delta_shared)
                sid = F.regexp_extract(F.input_file_name(), r"(s\d{8})/delta_shared", 1)
                cond = F.lit(False)
                for d, allowed in sorted(grp_shared.items()):
                    d_sid = d.split("/")[1]  # snapshots/<sid>/delta_shared
                    cond = cond | (
                        (sid == d_sid) & F.col(_BUCKET).isin(sorted(allowed))
                    )
            flt = sdf.filter(cond).drop(_BUCKET)
            parts.append(flt if sjson == cur_json else align_to_schema(flt, schema))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if has_delta:
            # merge-on-read reduce: base rows and delta rows carry the
            # applied version; latest (op_ts, batch_seq) per key wins
            df = dedup_latest_agg(df, self.key_cols, [S.META_OP_TS, S.META_BATCH_SEQ])
        return df

    def manifest_at(self, snapshot_id: int) -> dict:
        """Load a historical manifest (time travel; available until
        expire_snapshots removes it), folded to its full logical form."""
        return self._fold_by_name(f"m{snapshot_id:08d}.json")

    def read_state(self, as_of_snapshot: int | None = None) -> DataFrame | None:
        """Full state including tombstones and version metadata.
        None only if the table was never created; an existing empty
        table (e.g. just truncated) reads as an empty DataFrame.
        ``as_of_snapshot`` reads a historical snapshot (time travel)."""
        m = (
            self.current_manifest()
            if as_of_snapshot is None
            else self.manifest_at(as_of_snapshot)
        )
        if m is None:
            return None
        all_buckets = {int(k) for k in m["buckets"]} | {
            int(k) for k in m.get("deltas", {})
        }
        out = self._read_buckets(m, sorted(all_buckets))
        if out is None:
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            return self.spark.createDataFrame([], schema=schema)
        return out

    def read(self, as_of_snapshot: int | None = None) -> DataFrame | None:
        """User-facing table: live rows, user columns only.  Pass
        ``as_of_snapshot`` for a point-in-time (time-travel) read —
        every commit is a snapshot, so any committed batch boundary is
        reconstructible until GC'd."""
        st = self.read_state(as_of_snapshot)
        if st is None:
            return None
        return st.filter(~F.col(S.META_DELETED)).drop(*S.META_COLS)

    def read_keys(
        self, keys: list[tuple], as_of_snapshot: int | None = None
    ) -> DataFrame | None:
        """Bucket-pruned point lookup (the serving-side analogue of the
        write-side bucket pruning): read ONLY the bucket files the
        requested keys hash to, then semi-join the key list.

        A 1-key lookup scans 1 of ``n_buckets`` files instead of the
        whole table (``read()`` always scans every bucket because
        bucket = hash(full key) admits no predicate pruning).  ``keys``
        are tuples in ``key_cols`` order; the list is driver-sized by
        nature (point lookups), the bucket scan stays distributed.  The
        bucket ids come from the SAME widen-stable hash expression the
        writer uses, evaluated over the key list itself, so pruning and
        data can never disagree.  None if the table was never created.
        """
        m = (
            self.current_manifest()
            if as_of_snapshot is None
            else self.manifest_at(as_of_snapshot)
        )
        if m is None:
            return None
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        user_schema = T.StructType(
            [f_ for f_ in schema.fields if f_.name not in S.META_COLS]
        )
        if not keys:
            return self.spark.createDataFrame([], schema=user_schema)
        by_name = {f_.name: f_ for f_ in schema.fields}
        key_schema = T.StructType([by_name[c] for c in self.key_cols])
        keys_df = self.spark.createDataFrame(list(keys), schema=key_schema)
        buckets = sorted(
            r[0]
            for r in keys_df.select(self._bucket_expr().alias("b")).distinct().collect()
        )
        st = self._read_buckets(m, buckets)
        if st is None:
            return self.spark.createDataFrame([], schema=user_schema)
        live = st.filter(~F.col(S.META_DELETED)).drop(*S.META_COLS)
        return live.join(F.broadcast(keys_df), on=self.key_cols, how="left_semi")

    def read_prune_for(
        self, keys_df: DataFrame, as_of_snapshot: int | None = None
    ) -> DataFrame | None:
        """Live rows from ONLY the buckets that any key in ``keys_df``
        hashes to — set-oriented pruning for batch-vs-table joins
        (e.g. an arriving micro-batch probing the corpus hash index).

        Unlike ``read_keys`` the key set stays distributed: the only
        driver-side collect is the DISTINCT bucket-id list, bounded by
        ``n_buckets`` ints regardless of batch size.  The caller joins
        the returned frame itself; rows from shared buckets that match
        no key are simply dropped by that join.  Pruning pays off when
        the batch's keys cluster into few buckets or n_buckets is large
        relative to the batch; a batch touching every bucket degrades
        gracefully to the full scan ``read()`` would do anyway."""
        m = (
            self.current_manifest()
            if as_of_snapshot is None
            else self.manifest_at(as_of_snapshot)
        )
        if m is None:
            return None
        buckets = sorted(
            r[0]
            for r in keys_df.select(self._bucket_expr().alias("b")).distinct().collect()
        )
        st = self._read_buckets(m, buckets)
        if st is None:
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            user = T.StructType(
                [f_ for f_ in schema.fields if f_.name not in S.META_COLS]
            )
            return self.spark.createDataFrame([], schema=user)
        return st.filter(~F.col(S.META_DELETED)).drop(*S.META_COLS)

    def read_changes(self) -> DataFrame | None:
        """The per-field change-audit table written by
        ``apply_batch(emit_change_rows=True)``: one row per
        (key, field, old_value, new_value, batch_id) — what downstream
        CDC consumers tail (full E6, chomper/contrib/sql/
        exporters.py:304-333).  Only change dirs referenced by the
        CURRENT manifest are visible (commit-atomic with the table
        state; truncate clears them).  None if no committed changes."""
        rels = sorted(self._changes_map(self.current_manifest()).values())
        if not rels:
            return None
        return self.spark.read.parquet(
            *[os.path.join(self.root, rel) for rel in rels]
        )

    def _changes_map(self, manifest: dict | None, for_gc: bool = False) -> dict:
        """Visible change dirs for a manifest.  Manifests written before
        the 'changes' key existed reference nothing explicitly — fall
        back to on-disk dirs (legacy migration; the next commit
        backfills the key), but only admit dirs whose batch_id is in the
        committed ledger: a crash between the pre-commit change-rows
        write and the _CURRENT flip must not make that uncommitted
        batch's rows visible (commit atomicity).  ``for_gc=True`` keeps
        the unfiltered fallback so retention never deletes a legacy dir
        it cannot prove dead."""
        if manifest is None:
            return {}
        if "changes" in manifest:
            return manifest["changes"]
        cdir = os.path.join(self.root, "changes")
        if not os.path.isdir(cdir):
            return {}
        all_dirs = {
            d.split("=", 1)[1]: f"changes/{d}"
            for d in sorted(os.listdir(cdir))
            if "=" in d
        }
        if for_gc:
            return all_dirs
        return {
            b: rel
            for b, rel in all_dirs.items()
            if b.lstrip("-").isdigit() and _ledger_contains(manifest, int(b))
        }

    # ------------------------------------------------------------- merging

    def _retry_conflicts(self, op):
        """Run ``op()`` (which re-reads HEAD itself), retrying on commit
        CAS conflicts — the loser of a concurrent-writer race recomputes
        against the winner's manifest, so both effects land (or, for a
        replayed batch, the ledger re-check inside ``op`` skips it)."""
        for _ in range(_COMMIT_RETRIES):
            try:
                return op()
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"lost the commit race {_COMMIT_RETRIES} times in a row on "
            f"{self.root} — check for a runaway concurrent writer"
        )

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        update_only_nulls: bool = False,
        insert_missing: bool = True,
        protected: tuple[str, ...] = (),
        listen_fields: tuple[str, ...] = (),
        collect_metrics: bool = True,
        batch_time=None,
        emit_change_rows: bool = False,
        delta_layout: str = "bucketed",
    ) -> MergeMetrics:
        """Public apply — see ``_apply_batch_attempt`` for semantics.
        Wraps one attempt in the commit-conflict retry loop: a batch
        that loses the CAS race to a concurrent maintenance commit
        (compaction, truncate) re-reads HEAD and re-applies against the
        new parent; a batch whose id the winner already committed is
        skipped by the ledger re-check on the retry pass."""
        return self._retry_conflicts(
            lambda: self._apply_batch_attempt(
                batch,
                batch_id,
                update_only_nulls=update_only_nulls,
                insert_missing=insert_missing,
                protected=protected,
                listen_fields=listen_fields,
                collect_metrics=collect_metrics,
                batch_time=batch_time,
                emit_change_rows=emit_change_rows,
                delta_layout=delta_layout,
            )
        )

    def _apply_batch_attempt(
        self,
        batch: DataFrame,
        batch_id: int,
        update_only_nulls: bool = False,
        insert_missing: bool = True,
        protected: tuple[str, ...] = (),
        listen_fields: tuple[str, ...] = (),
        collect_metrics: bool = True,
        batch_time=None,
        emit_change_rows: bool = False,
        delta_layout: str = "bucketed",
    ) -> MergeMetrics:
        """Apply one micro-batch of change events. Idempotent.

        ``update_only_nulls`` — E9 .overwrite(False): matched rows only
        fill target-NULL columns.  ``insert_missing=False`` — E3 Updater
        (matched-only).  ``protected`` — E11 columns never updated.
        ``listen_fields`` — E6: count per-field changes on updates.
        ``batch_time`` — the event/commit time stamped into the E9
        audit columns (required when ``audit_timestamps``; a datetime,
        NOT current_timestamp, so replay is deterministic).
        ``emit_change_rows`` — full E6: write the per-field change rows
        (key, field, old, new, batch_id) for ``listen_fields`` to the
        table's ``changes/`` area (idempotent per batch); read them
        back with ``read_changes()``.
        ``delta_layout`` (MOR only) — "bucketed" (default) appends one
        delta file per touched bucket: right for big batches, but a
        SMALL batch still pays O(n_buckets) files/tasks, so a
        high-frequency streaming trigger on a 4096-bucket table would
        write 4096 tiny files per trigger (measured ~78 ms/file —
        file-count explosion).  "single" writes the whole batch as ONE
        delta file carrying the bucket id as a data column, referenced
        by every touched bucket's chain and bucket-filtered at read;
        inline compaction folds it into bucketed bases as chains grow.

        Metrics ride the merge jobs via ``df.observe`` — with
        ``collect_metrics=True`` no extra Spark jobs run (MOR adds
        zero; COW's only extra pass is the bucket-pruning collect that
        runs regardless).
        """
        if batch_id < 0:
            # the watermark ledger treats every id ≤ watermark as
            # committed, so a negative id would be silently skipped as
            # a replay — reject it instead of dropping data
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        metrics = MergeMetrics(batch_id=batch_id)
        manifest = self.current_manifest()
        if _ledger_contains(manifest, batch_id):
            metrics.skipped = True
            return metrics
        if self.audit_timestamps and batch_time is None:
            raise ValueError("audit_timestamps sinks need batch_time=<datetime>")
        if emit_change_rows and not listen_fields:
            raise ValueError("emit_change_rows needs listen_fields")
        if delta_layout not in ("bucketed", "single"):
            raise ValueError(f"delta_layout must be 'bucketed' or 'single', got {delta_layout!r}")
        if delta_layout == "single" and self.write_mode != "mor":
            raise ValueError("delta_layout='single' applies to write_mode='mor' only")

        # on an AUDIT sink the audit column names are engine-reserved
        # (never payload); a plain sink must NOT strip user columns that
        # merely share those common names
        reserved = (
            (S.OP_COL, *self.version_cols, "batch_id", *S.AUDIT_COLS)
            if self.audit_timestamps
            else (S.OP_COL, *self.version_cols, "batch_id")
        )
        payload_schema = T.StructType(
            [f_ for f_ in batch.schema.fields if f_.name not in reserved]
        )
        # -- schema evolution against the live table schema
        if manifest:
            cur_state_schema = T.StructType.fromJson(json.loads(manifest["schema"]))
            cur_payload = T.StructType(
                [
                    f_
                    for f_ in cur_state_schema.fields
                    if f_.name not in S.META_COLS
                    and not (self.audit_timestamps and f_.name in S.AUDIT_COLS)
                ]
            )
            new_payload, report = evolve_schema(cur_payload, payload_schema)
            metrics.schema_added = report.added_columns
            metrics.schema_widened = report.widened_columns
        else:
            new_payload = payload_schema
        state_schema = _meta_schema(new_payload, audit=self.audit_timestamps)
        payload_cols = [f_.name for f_ in new_payload.fields]
        data_cols = [c for c in payload_cols if c not in self.key_cols]

        obs_in = obs_merge = obs_write = None
        if collect_metrics:
            from pyspark.sql import Observation

            obs_in, obs_merge, obs_write = Observation(), Observation(), Observation()

        # -- project the raw batch to the (evolved) payload + version/meta
        # columns, with the widen-stable bucket id (pure codegen, no action)
        have = set(batch.columns)
        proj = [
            F.col(f_.name).cast(f_.dataType).alias(f_.name)
            if f_.name in have
            else F.lit(None).cast(f_.dataType).alias(f_.name)
            for f_ in new_payload.fields
        ]
        projected = batch.select(
            *proj,
            F.col(S.OP_COL),
            F.col(self.version_cols[0]).alias(S.META_OP_TS),
            F.col(self.version_cols[1]).cast("long").alias(S.META_BATCH_SEQ),
        ).withColumn(_BUCKET, self._bucket_expr())

        evolved = bool(metrics.schema_added or metrics.schema_widened)
        special = bool(
            update_only_nulls or not insert_missing or protected or listen_fields
            or self.audit_timestamps
        )
        # fast COW path (round 6, guide §2.4/§3): a plain apply (no
        # pre-image-dependent mode, no per-arm metrics) does not need
        # the full-outer join at all — ``take_src`` is "source wins iff
        # strictly newer by (op_ts, batch_seq)", which over a total
        # version order is exactly the latest-wins reduce the MOR read
        # side already runs (ties resolved to the TARGET by an explicit
        # target-wins ordering bit, matching take_src bit-for-bit).
        # union(target-state, batch-state) → repartition(_bucket) →
        # partition-aligned max_by aggregate replaces [Exchange(src
        # keys) + Exchange(tgt keys) + 2 Sorts + SortMergeJoin
        # FullOuter + Exchange(_bucket)] with ONE exchange, and
        # subsumes the separate batch dedup aggregate (map-side partial
        # agg collapses intra-batch dupes pre-shuffle).  Audit
        # timestamps ride the same reduce: created_at = the target
        # row's created_at when the key existed (an aggregate over the
        # target-side flag — at most one target row per key) else
        # batch_time; updated_at = batch_time iff the source side wins.
        # emit_change_rows rides the fast path too: the state merge does
        # not need the pre-image join — only the change ROWS do, and
        # those come from a plain INNER join of the (deduped) batch
        # against the touched target rows, which the planner/AQE can
        # broadcast; the old shape persisted the full-outer merge join
        # to drive both the state write and the change write from it.
        fast = (
            not (update_only_nulls or not insert_missing or protected)
            and not collect_metrics
            and not (listen_fields and not emit_change_rows)
        )
        if self.write_mode == "mor":
            if special:
                raise ValueError(
                    "update_only_nulls / insert_missing=False / protected / "
                    "listen_fields / audit_timestamps need the pre-image at "
                    "write time — use write_mode='cow'"
                )
            # schema evolution is metadata-only on the MOR path too: the
            # delta files of this batch carry the evolved schema, older
            # files align at read via schema_history
            return self._apply_mor(
                projected, manifest, batch_id, state_schema, payload_cols,
                metrics, collect_metrics, obs_in, obs_merge,
                delta_layout=delta_layout, evolved=evolved,
            )

        if collect_metrics:
            # events_in piggybacks on whatever action consumes the plan
            # (attached here, AFTER the MOR branch — the MOR path
            # attaches its own observations so both ride its single
            # write job)
            projected = projected.observe(obs_in, F.count(F.lit(1)).alias("n"))

        if fast:
            # the union reduce below dedups the batch in the same job —
            # persist the raw projection, skip the separate aggregate
            src = projected.persist()
        else:
            # -- dedup latest-wins inside the batch: max_by aggregate
            # (map-side combine collapses dupes pre-shuffle; the
            # window/row_number form in operators/dedup.py is
            # semantically identical)
            src = dedup_latest_agg(
                projected, self.key_cols, [S.META_OP_TS, S.META_BATCH_SEQ]
            )
            if collect_metrics:
                src = src.observe(obs_merge, F.count(F.lit(1)).alias("n"))
            src = src.persist()
        # -- bucket pruning: only read/rewrite the buckets this batch
        # touches.  This collect also materializes the (cached) dedup and
        # populates the events_in / merge_rows observations for free.
        touched = sorted(r[0] for r in src.select(_BUCKET).distinct().collect())
        # schema evolution is metadata-only: the commit records the new
        # schema in schema_history and touches ONLY this batch's buckets;
        # files under older schemas are NULL-backfilled/cast at read
        # (see _read_buckets) and rewritten lazily by compaction.
        metrics.buckets_touched = len(touched)
        if collect_metrics:
            # observations were populated by the collect above
            metrics.events_in = int(_obs_row(obs_in).get("n") or 0)
            metrics.merge_rows = int(_obs_row(obs_merge).get("n") or 0)
            metrics.dedup_drops = metrics.events_in - metrics.merge_rows

        tgt = self._read_buckets(manifest, touched) if manifest else None
        changes_written = False
        audit_cols = (
            [
                F.lit(batch_time).cast("timestamp").alias(S.AUDIT_CREATED),
                F.lit(batch_time).cast("timestamp").alias(S.AUDIT_UPDATED),
            ]
            if self.audit_timestamps
            else []
        )

        if fast:
            _TGT = "_is_tgt"
            src_state = src.select(
                *payload_cols,
                *audit_cols,  # batch_time-stamped create/update (audit only)
                F.col(S.META_OP_TS),
                F.col(S.META_BATCH_SEQ),
                (F.col(S.OP_COL) == "D").alias(S.META_DELETED),
                F.col(_BUCKET),
                F.lit(False).alias(_TGT),
            )
            if tgt is None:
                unioned = src_state
            else:
                tgt_state = (
                    align_to_schema(tgt, state_schema)
                    .withColumn(_BUCKET, self._bucket_expr())
                    .withColumn(_TGT, F.lit(True))
                )
                unioned = tgt_state.unionByName(src_state)
            rest = [c for c in unioned.columns if c not in (*self.key_cols, _BUCKET)]
            if self.compact_on_write:
                # the same exchange the write needs; HashPartitioning on
                # _bucket satisfies the aggregate's clustering on
                # (_bucket, *keys), so the reduce adds NO second exchange
                # and the write consumes it partition-aligned
                unioned = unioned.repartition(
                    min(self.n_buckets, max(1, len(touched))), _BUCKET
                )
            aggs = [
                F.max_by(
                    F.struct(*[F.col(c) for c in rest]),
                    # target-wins tie-break: take_src requires the source
                    # to be STRICTLY newer, so on an exact version tie
                    # the target row must win the reduce too
                    F.struct(
                        F.col(S.META_OP_TS), F.col(S.META_BATCH_SEQ), F.col(_TGT)
                    ),
                ).alias("_r")
            ]
            if self.audit_timestamps:
                aggs += [
                    F.max(F.when(F.col(_TGT), F.col(S.AUDIT_CREATED))).alias("_tc"),
                    F.max(F.when(F.col(_TGT), F.col(S.AUDIT_UPDATED))).alias("_tu"),
                ]
            picked = unioned.groupBy(_BUCKET, *self.key_cols).agg(*aggs)
            out_cols = [
                F.col(f"_r.{c}").alias(c)
                for c in rest
                if c != _TGT and not (
                    self.audit_timestamps and c in (S.AUDIT_CREATED, S.AUDIT_UPDATED)
                )
            ]
            if self.audit_timestamps:
                bt = F.lit(batch_time).cast("timestamp")
                out_cols += [
                    # key existed before → its created_at survives (live
                    # or tombstoned); first materialization → batch_time
                    F.coalesce(F.col("_tc"), bt).alias(S.AUDIT_CREATED),
                    # applied change (source side won) → batch_time;
                    # else the target's updated_at stands
                    F.when(~F.col(f"_r.{_TGT}"), bt)
                    .otherwise(F.col("_tu"))
                    .alias(S.AUDIT_UPDATED),
                ]
            merged = picked.select(*self.key_cols, *out_cols, F.col(_BUCKET))
            if emit_change_rows and tgt is not None:
                # change rows = applied UPDATEs that changed a listened
                # field on a live row: inner join of the deduped batch
                # against the touched target rows (first-ever batch has
                # no pre-image → no change dir, as on the join path)
                sdd = dedup_latest_agg(
                    src, self.key_cols, [S.META_OP_TS, S.META_BATCH_SEQ]
                ).alias("s")
                t2 = tgt_state.alias("t")
                s_newer2 = (
                    F.col(f"s.{S.META_OP_TS}") > F.col(f"t.{S.META_OP_TS}")
                ) | (
                    (F.col(f"s.{S.META_OP_TS}") == F.col(f"t.{S.META_OP_TS}"))
                    & (F.col(f"s.{S.META_BATCH_SEQ}") > F.col(f"t.{S.META_BATCH_SEQ}"))
                )
                changed_rows = (
                    t2.join(sdd, on=self.key_cols, how="inner")
                    .filter(
                        s_newer2
                        & ~F.col(f"t.{S.META_DELETED}")
                        & (F.col(f"s.{S.OP_COL}") != "D")
                    )
                    .select(
                        *self.key_cols,
                        F.explode(
                            F.filter(
                                F.array(
                                    *[
                                        F.struct(
                                            F.lit(c).alias("field"),
                                            F.col(f"t.{c}").cast("string").alias("old_value"),
                                            F.col(f"s.{c}").cast("string").alias("new_value"),
                                            (
                                                ~F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}"))
                                            ).alias("_chg"),
                                        )
                                        for c in listen_fields
                                    ]
                                ),
                                lambda x: x["_chg"],
                            )
                        ).alias("_c"),
                    )
                    .select(
                        *self.key_cols,
                        F.col("_c.field").alias("field"),
                        F.col("_c.old_value").alias("old_value"),
                        F.col("_c.new_value").alias("new_value"),
                        F.lit(batch_id).cast("long").alias("batch_id"),
                    )
                )
                changed_rows.write.mode("overwrite").parquet(
                    os.path.join(self.root, "changes", f"batch_id={batch_id}")
                )
                changes_written = True
        elif tgt is None:
            merged = src.select(
                *payload_cols,
                *audit_cols,
                F.col(S.META_OP_TS),
                F.col(S.META_BATCH_SEQ),
                (F.col(S.OP_COL) == "D").alias(S.META_DELETED),
                F.col(_BUCKET),
            )
            if collect_metrics:
                merged = merged.observe(
                    obs_write,
                    F.sum(F.when(~F.col(S.META_DELETED), 1).otherwise(0)).alias("ins"),
                )
        else:
            # align old snapshot files to the EVOLVED schema (new columns
            # NULL-backfill, widened types cast — vectorized, JVM-side)
            tgt = align_to_schema(tgt, state_schema).withColumn(
                _BUCKET, self._bucket_expr()
            )
            t, s = tgt.alias("t"), src.alias("s")
            joined = t.join(s, on=self.key_cols, how="full_outer")

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

            live_t = t_present & ~F.col(f"t.{S.META_DELETED}")

            def applied_val(c: str) -> F.Column:
                """The value an applied UPDATE actually writes for c —
                change counts/rows must reflect what lands in the table,
                not the raw source image (update_only_nulls only fills
                target NULLs; protected columns are never written)."""
                t_c, s_c = F.col(f"t.{c}"), F.col(f"s.{c}")
                if c in protected:
                    return t_c
                if update_only_nulls:
                    return F.coalesce(t_c, s_c)
                return s_c

            def field_changed(c: str) -> F.Column:
                return (
                    take_src
                    & live_t
                    & (F.col(f"s.{S.OP_COL}") != "D")
                    & ~applied_val(c).eqNullSafe(F.col(f"t.{c}"))
                )

            if collect_metrics:
                # per-op counts + field-change counts ride the write job
                aggs = [
                    F.sum(F.when(take_src & ~live_t & (F.col(f"s.{S.OP_COL}") != "D"), 1).otherwise(0)).alias("ins"),
                    F.sum(F.when(take_src & live_t & (F.col(f"s.{S.OP_COL}") != "D"), 1).otherwise(0)).alias("upd"),
                    F.sum(F.when(take_src & live_t & (F.col(f"s.{S.OP_COL}") == "D"), 1).otherwise(0)).alias("del"),
                ] + [
                    F.sum(F.when(field_changed(c), 1).otherwise(0)).alias(f"chg_{c}")
                    for c in listen_fields
                ]
                joined = joined.observe(obs_write, *aggs)
            if emit_change_rows:
                # the changes write below is a second action over the join
                joined = joined.persist()

            if self.audit_timestamps:
                audit_cols = [
                    # created_at fixed at first materialization, survives
                    # updates; updated_at advances on every applied change
                    F.when(take_src & ~t_present, F.lit(batch_time).cast("timestamp"))
                    .otherwise(F.col(f"t.{S.AUDIT_CREATED}"))
                    .alias(S.AUDIT_CREATED),
                    F.when(take_src, F.lit(batch_time).cast("timestamp"))
                    .otherwise(F.col(f"t.{S.AUDIT_UPDATED}"))
                    .alias(S.AUDIT_UPDATED),
                ]
            merged = joined.select(
                *self.key_cols,
                *[pick(c) for c in data_cols],
                *audit_cols,
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

            if emit_change_rows:
                # full E6 (chomper/contrib/sql/exporters.py:304-333): one
                # change row per (key, listened field) whose value an
                # applied UPDATE changed — the audit feed downstream CDC
                # consumers tail.  Overwrite-per-batch = replay-idempotent.
                changed_rows = joined.filter(
                    take_src & live_t & (F.col(f"s.{S.OP_COL}") != "D")
                ).select(
                    *self.key_cols,
                    F.explode(
                        F.filter(
                            F.array(
                                *[
                                    F.struct(
                                        F.lit(c).alias("field"),
                                        F.col(f"t.{c}").cast("string").alias("old_value"),
                                        applied_val(c).cast("string").alias("new_value"),
                                        (~applied_val(c).eqNullSafe(F.col(f"t.{c}"))).alias("_chg"),
                                    )
                                    for c in listen_fields
                                ]
                            ),
                            lambda x: x["_chg"],
                        )
                    ).alias("_c"),
                ).select(
                    *self.key_cols,
                    F.col("_c.field").alias("field"),
                    F.col("_c.old_value").alias("old_value"),
                    F.col("_c.new_value").alias("new_value"),
                    F.lit(batch_id).cast("long").alias("batch_id"),
                )
                changed_rows.write.mode("overwrite").parquet(
                    os.path.join(self.root, "changes", f"batch_id={batch_id}")
                )
                changes_written = True

        # -- write the new snapshot (only touched buckets) under a
        # claimed dir; commit id (manifest position) is decoupled —
        # see _claim_snapshot_dir
        snap_id = (manifest["snapshot_id"] + 1) if manifest else 0
        dir_id, _ = self._claim_snapshot_dir()
        rel_data = f"snapshots/s{dir_id:08d}/data"
        out_path = os.path.join(self.root, rel_data)
        merged = align_to_schema(merged, T.StructType(state_schema.fields + [T.StructField(_BUCKET, T.IntegerType(), False)]))
        if self.compact_on_write and not fast:
            # the fast path repartitioned BEFORE its reduce (same
            # exchange, partition-aligned through the aggregate)
            merged = merged.repartition(min(self.n_buckets, max(1, len(touched))), _BUCKET)
        merged.write.mode("overwrite").partitionBy(_BUCKET).parquet(out_path)
        src.unpersist()
        if tgt is not None and emit_change_rows and not fast:
            joined.unpersist()
        if collect_metrics:
            row = _obs_row(obs_write)  # populated by the write job above
            metrics.inserted = int(row.get("ins") or 0)
            if tgt is not None:
                metrics.updated = int(row.get("upd") or 0)
                metrics.deleted = int(row.get("del") or 0)
                metrics.field_changes = {
                    c: int(row.get(f"chg_{c}") or 0) for c in listen_fields
                }

        buckets = dict(manifest["buckets"]) if manifest else {}
        deltas = dict(manifest.get("deltas", {})) if manifest else {}
        # record every bucket dir the write actually produced (defensive:
        # never leave a written bucket unreferenced or a moved key stale)
        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(out_path)
            if d.startswith(f"{_BUCKET}=")
        }
        bucket_updates: dict[str, str] = {}
        delta_removals: list[str] = []
        for k in sorted(written | set(touched)):
            bucket_dir = os.path.join(out_path, f"{_BUCKET}={k}")
            if os.path.isdir(bucket_dir):
                buckets[str(k)] = f"{rel_data}/{_BUCKET}={k}"
                bucket_updates[str(k)] = buckets[str(k)]
            # the COW rewrite folded any delta chain for this bucket
            if deltas.pop(str(k), None) is not None:
                delta_removals.append(str(k))
        wm, recent = _ledger_add(manifest, batch_id)
        # change-audit dirs become VISIBLE only via the manifest: the
        # parquet write above happens pre-commit, so a crash before the
        # _CURRENT flip leaves an unreferenced (invisible) dir, never a
        # phantom change row for an uncommitted batch
        legacy = manifest is not None and "changes" not in manifest
        changes_map = dict(self._changes_map(manifest))
        changes_updates: dict[str, str] = {}
        if changes_written:  # first-ever batch has no pre-image → no dir
            changes_map[str(batch_id)] = f"changes/batch_id={batch_id}"
            changes_updates[str(batch_id)] = changes_map[str(batch_id)]
        schema_json = json.dumps(state_schema.jsonValue())
        # schema history epochs are keyed by DATA-DIR id (what
        # _schema_for_rel parses out of file paths), not commit id
        history = self._next_schema_history(manifest, evolved, dir_id, schema_json)
        delta_doc = {
            "bucket_updates": bucket_updates,
            "delta_removals": delta_removals,
            "changes_updates": changes_updates,
        }
        if evolved:  # fold must adopt the appended history
            delta_doc["schema_history"] = history
        self._commit(
            {
                "snapshot_id": snap_id,
                "batch_watermark": wm,
                "recent_batches": recent,
                "buckets": buckets,
                "deltas": deltas,
                "changes": changes_map,
                "schema": schema_json,
                "schema_history": history,
                "key_cols": self.key_cols,
                "bucket_cols": self.bucket_cols,
                "n_buckets": self.n_buckets,
            },
            parent=manifest,
            delta_doc=delta_doc,
            # a legacy-v1 parent needs its on-disk-scanned changes map
            # materialized once
            force_full=legacy,
        )
        return metrics

    def _apply_mor(
        self,
        projected: DataFrame,
        manifest: dict | None,
        batch_id: int,
        state_schema: T.StructType,
        payload_cols: list[str],
        metrics: MergeMetrics,
        collect_metrics: bool,
        obs_in=None,
        obs_merge=None,
        delta_layout: str = "bucketed",
        evolved: bool = False,
    ) -> MergeMetrics:
        """Merge-on-read apply: append one delta file per touched bucket
        (O(batch) write, no target read), then fold any delta chain that
        exceeds the compaction threshold into a new base (amortized).

        ONE shuffle and ONE Spark job per batch: the repartition by
        bucket is the only exchange — the latest-wins dedup groups on
        (bucket, key), and HashPartitioning(bucket) already satisfies
        that clustering, so Catalyst plans the aggregate WITHOUT a
        second exchange and the write consumes it partition-aligned
        (exactly one file per bucket).  Touched buckets come from the
        dirs the write produced — no distinct-collect pre-pass.

        The delta row IS the state row (full row image + version +
        tombstone flag): the read-side latest-wins reduce
        (see _read_buckets) makes base∪deltas equivalent to the COW
        table at every point — same oracle, same exactly-once ledger."""
        snap_id = (manifest["snapshot_id"] + 1) if manifest else 0
        dir_id, _ = self._claim_snapshot_dir()
        single = delta_layout == "single"
        rel_delta = f"snapshots/s{dir_id:08d}/" + ("delta_shared" if single else "delta")
        out_path = os.path.join(self.root, rel_delta)

        # The write runs with AQE ON in the caller's session, unmodified:
        # round 2 disabled AQE around this static plan (then-measured
        # ~1s/batch driver re-planning), but session conf is SHARED
        # state and a concurrently-planned COW join could observe AQE
        # off and lose skew handling.  Re-measured this round (8 cores,
        # 8M events, 3 reps each): AQE-on is no slower (13.7s vs 13.0s
        # clone / 15.3s fresh-JVM with the off-toggle), so the toggle is
        # gone entirely — no conf mutation, nothing to scope.  AQE keeps
        # its hands off the plan anyway: repartition(n, col) with an
        # explicit n is never coalesced, and the fused agg needs no
        # exchange for AQE to re-plan.
        proj = projected
        if collect_metrics:
            proj = proj.observe(obs_in, F.count(F.lit(1)).alias("n"))
        rest = [c for c in proj.columns if c not in (*self.key_cols, _BUCKET)]
        dd = (
            proj.repartition(1 if single else self.n_buckets, _BUCKET)
            .groupBy(_BUCKET, *self.key_cols)
            .agg(
                F.max_by(
                    F.struct(*rest),
                    F.struct(F.col(S.META_OP_TS), F.col(S.META_BATCH_SEQ)),
                ).alias("_r")
            )
            .select(
                _BUCKET, *self.key_cols, *[F.col(f"_r.{c}").alias(c) for c in rest]
            )
        )
        delta_df = dd.select(
            *payload_cols,
            F.col(S.META_OP_TS),
            F.col(S.META_BATCH_SEQ),
            (F.col(S.OP_COL) == "D").alias(S.META_DELETED),
            F.col(_BUCKET),
        )
        delta_df = align_to_schema(
            delta_df,
            T.StructType(
                state_schema.fields + [T.StructField(_BUCKET, T.IntegerType(), False)]
            ),
        )
        if collect_metrics:
            # both counts ride the single write job — zero extra jobs
            delta_df = delta_df.observe(obs_merge, F.count(F.lit(1)).alias("n"))
        if single:
            # one delta file for the whole batch, bucket id as a data
            # column; the touched-bucket set rides the same write job
            # via collect_set (bounded by n_buckets values)
            from pyspark.sql import Observation

            obs_buckets = Observation()
            delta_df = delta_df.observe(
                obs_buckets, F.collect_set(F.col(_BUCKET)).alias("bks")
            )
            delta_df.write.mode("overwrite").parquet(out_path)
            written = sorted(int(x) for x in (_obs_row(obs_buckets).get("bks") or []))
        else:
            delta_df.write.mode("overwrite").partitionBy(_BUCKET).parquet(out_path)
        if collect_metrics:
            metrics.events_in = int(_obs_row(obs_in).get("n") or 0)
            metrics.merge_rows = int(_obs_row(obs_merge).get("n") or 0)
            metrics.dedup_drops = metrics.events_in - metrics.merge_rows

        buckets = dict(manifest["buckets"]) if manifest else {}
        deltas = {k: list(v) for k, v in (manifest.get("deltas", {}) if manifest else {}).items()}
        if not single:
            written = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(out_path)
                if d.startswith(f"{_BUCKET}=")
            )
        metrics.buckets_touched = len(written)
        delta_sets: dict[str, list] = {}
        bucket_updates: dict[str, str] = {}
        bucket_removals: list[str] = []
        delta_removals: list[str] = []
        for k in written:
            chain = deltas.setdefault(str(k), [])
            chain.append(rel_delta if single else f"{rel_delta}/{_BUCKET}={k}")
            delta_sets[str(k)] = list(chain)

        # -- inline compaction of long chains (before the commit, so the
        # fold and the ledger update land atomically together)
        to_compact = [
            int(k) for k, v in deltas.items() if len(v) >= self.mor_compact_threshold
        ]
        schema_json = json.dumps(state_schema.jsonValue())
        history = self._next_schema_history(manifest, evolved, dir_id, schema_json)
        if to_compact:
            probe = {
                "buckets": buckets,
                "deltas": deltas,
                "schema": schema_json,
                # mixed-schema chains (post-evolution) resolve per file
                "schema_history": history,
            }
            reduced = self._read_buckets(probe, to_compact)
            rel_base = f"snapshots/s{dir_id:08d}/base"
            base_path = os.path.join(self.root, rel_base)
            folded = reduced.withColumn(_BUCKET, self._bucket_expr())
            if self.compact_on_write:
                folded = folded.repartition(
                    min(self.n_buckets, max(1, len(to_compact))), _BUCKET
                )
            folded.write.mode("overwrite").partitionBy(_BUCKET).parquet(base_path)
            for k in to_compact:
                if os.path.isdir(os.path.join(base_path, f"{_BUCKET}={k}")):
                    buckets[str(k)] = f"{rel_base}/{_BUCKET}={k}"
                    bucket_updates[str(k)] = buckets[str(k)]
                elif buckets.pop(str(k), None) is not None:
                    bucket_removals.append(str(k))
                deltas.pop(str(k), None)
                delta_sets.pop(str(k), None)
                delta_removals.append(str(k))

        wm, recent = _ledger_add(manifest, batch_id)
        legacy = manifest is not None and "changes" not in manifest
        delta_doc = {
            "bucket_updates": bucket_updates,
            "bucket_removals": bucket_removals,
            "delta_sets": delta_sets,
            "delta_removals": delta_removals,
        }
        if evolved:
            delta_doc["schema_history"] = history
        self._commit(
            {
                "snapshot_id": snap_id,
                "batch_watermark": wm,
                "recent_batches": recent,
                "buckets": buckets,
                "deltas": deltas,
                "changes": dict(self._changes_map(manifest)),
                "schema": schema_json,
                "schema_history": history,
                "key_cols": self.key_cols,
                "bucket_cols": self.bucket_cols,
                "n_buckets": self.n_buckets,
            },
            parent=manifest,
            delta_doc=delta_doc,
            force_full=legacy,
        )
        return metrics

    def describe(self) -> dict:
        """Operator-facing table summary (metadata only — no data scan):
        snapshot/ledger position, manifest-chain state, bucket and
        delta-chain counts, schema-version spread.  The first thing a
        maintenance runbook checks before compact/expire decisions."""
        m = self.current_manifest()
        if m is None:
            return {"exists": False, "root": self.root}
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        history = m.get("schema_history") or []
        return {
            "exists": True,
            "root": self.root,
            "snapshot_id": m["snapshot_id"],
            "batch_watermark": m["batch_watermark"],
            "out_of_order_batches": len(m.get("recent_batches", ())),
            "manifest_chain_len": m.get("chain_len", 0),
            "n_buckets": self.n_buckets,
            "key_cols": list(self.key_cols),
            "bucket_cols": list(self.bucket_cols),
            "live_buckets": len(m["buckets"]),
            "delta_chains": len(m.get("deltas", {})),
            "delta_refs": sum(len(v) for v in m.get("deltas", {}).values()),
            "schema_versions_live": len({h["schema"] for h in history} or {m["schema"]}),
            "columns": [f_.name for f_ in schema.fields],
            "change_batches_visible": len(self._changes_map(m)),
        }

    def compact(self, upgrade_schema: bool = False) -> dict:
        """Commit-conflict-retrying wrapper over ``_compact_attempt``:
        a maintenance compaction racing the streaming apply re-reads
        HEAD (picking up the applied batch's new delta chains) and
        re-folds — never a silent clobber in either direction."""
        return self._retry_conflicts(lambda: self._compact_attempt(upgrade_schema))

    def _compact_attempt(self, upgrade_schema: bool = False) -> dict:
        """Fold EVERY delta chain into fresh per-bucket bases, now —
        the on-demand maintenance twin of the threshold-triggered
        inline compaction in ``_apply_mor`` (Iceberg's rewrite_data_files
        / Hudi's compactor).  Run from a maintenance job before
        serving-heavy periods: MOR reads then scan one base file per
        bucket with no latest-wins reduce work beyond the scan.

        ``upgrade_schema`` additionally rewrites every bucket whose
        files predate the newest schema version — the lazy-rewrite
        completion of metadata-only evolution: after it, all live files
        carry the current schema and reads are single-scan again.

        Commits a new snapshot; a no-op (returns unchanged counts)
        when there is nothing to fold.  Safe alongside readers — they
        follow the atomic ``_CURRENT`` pointer."""
        manifest = self.current_manifest()
        if manifest is None:
            return {"buckets_compacted": 0, "delta_refs_folded": 0}
        deltas = manifest.get("deltas", {})
        to_compact_set = {int(k) for k in deltas}
        history = manifest.get("schema_history") or []
        if upgrade_schema and len({h["schema"] for h in history}) > 1:
            latest_from = history[-1]["from_snapshot"]
            for k, rel in manifest["buckets"].items():
                if int(_SNAP_RE.search(rel).group(1)) < latest_from:
                    to_compact_set.add(int(k))
        if not to_compact_set:
            return {"buckets_compacted": 0, "delta_refs_folded": 0}
        to_compact = sorted(to_compact_set)
        n_refs = sum(len(v) for v in deltas.values())
        state_schema = T.StructType.fromJson(json.loads(manifest["schema"]))
        reduced = self._read_buckets(manifest, to_compact)
        snap_id = manifest["snapshot_id"] + 1
        dir_id, _ = self._claim_snapshot_dir()
        rel_base = f"snapshots/s{dir_id:08d}/base"
        base_path = os.path.join(self.root, rel_base)
        folded = reduced.withColumn(_BUCKET, self._bucket_expr())
        if self.compact_on_write:
            folded = folded.repartition(
                min(self.n_buckets, max(1, len(to_compact))), _BUCKET
            )
        folded.write.mode("overwrite").partitionBy(_BUCKET).parquet(base_path)
        buckets = dict(manifest["buckets"])
        for k in to_compact:
            if os.path.isdir(os.path.join(base_path, f"{_BUCKET}={k}")):
                buckets[str(k)] = f"{rel_base}/{_BUCKET}={k}"
            else:
                buckets.pop(str(k), None)
        schema_json = json.dumps(state_schema.jsonValue())
        if upgrade_schema:
            # every live file now carries the current schema (old-schema
            # buckets and all delta chains were just rewritten) — the
            # history collapses, so it cannot grow over years of
            # evolutions
            history = [{"from_snapshot": 0, "schema": schema_json}]
        else:
            history = list(
                manifest.get("schema_history")
                or [{"from_snapshot": 0, "schema": schema_json}]
            )
        self._commit(
            {
                "snapshot_id": snap_id,
                "batch_watermark": manifest["batch_watermark"],
                "recent_batches": list(manifest.get("recent_batches", ())),
                "buckets": buckets,
                "deltas": {},
                "changes": dict(self._changes_map(manifest)),
                "schema": schema_json,
                "schema_history": history,
                "key_cols": self.key_cols,
                "bucket_cols": self.bucket_cols,
                "n_buckets": self.n_buckets,
            },
            parent=manifest,
            force_full=True,  # maintenance rewrite → natural checkpoint
            # checkpoint sharding: only the folded buckets' shards are
            # rewritten — a targeted compaction on a wide table stays
            # O(touched shards) in manifest bytes too
            touched_keys={str(k) for k in to_compact},
        )
        return {"buckets_compacted": len(to_compact), "delta_refs_folded": n_refs}

    def expire_snapshots(
        self, keep_manifests: int = 3, orphan_age_seconds: int = 86_400
    ) -> dict:
        """Garbage-collect snapshot data no longer reachable.

        A continuous stream commits one snapshot per micro-batch; without
        retention the state dir grows O(batches × table).  Untouched
        buckets are carried forward BY REFERENCE, so a bucket dir from an
        old snapshot may still be live — only snapshot dirs referenced by
        no retained manifest are deleted.  (Iceberg's expire_snapshots is
        the managed-catalog equivalent.)  Returns {snapshots_removed,
        manifests_removed, bytes_freed}.

        ``orphan_age_seconds`` — the contract for cleaning ABOVE-HEAD
        debris (claimed snapshot dirs, checkpoint shard files,
        manifest-content temps that no committed manifest references):
        such a path might belong to a writer whose commit has not
        landed yet, so it is deleted only when older than this.  Like
        Iceberg's remove_orphan_files ``older_than``, it MUST exceed
        the longest possible in-flight write (claim-to-commit time);
        the 24 h default leaves orders of magnitude of headroom over
        any realistic micro-batch or compaction.  Below-HEAD
        unreferenced dirs need no age guard — a live writer only ever
        writes under claims above every committed dir id."""
        import shutil as _shutil

        mdir = os.path.join(self.root, "manifests")
        current_name = self._current_name()
        if current_name is None:  # table never created — nothing to GC
            return {"snapshots_removed": 0, "manifests_removed": 0, "bytes_freed": 0}
        # only committed manifests participate in retention: a leftover
        # m*.json.tmp from a crashed _commit must neither consume a
        # retention slot nor be loaded as JSON
        names = sorted(
            (n for n in os.listdir(mdir) if _MANIFEST_RE.match(n)), reverse=True
        )  # newest first
        keep = set(names[:keep_manifests]) | {current_name}
        # a kept DELTA manifest folds over ancestors that may fall
        # outside retention: rewrite each kept delta IN PLACE as a
        # self-contained checkpoint (atomic replace, same name/id)
        # BEFORE deleting anything — afterwards every kept manifest
        # stands alone, so ancestor files and the stale data they pinned
        # are all collectible.  Concurrency: commits race via the CAS
        # (_write_manifest), and a reader/writer whose fold walk loses
        # an ancestor to the deletions below retries from HEAD
        # (current_manifest), which the rewrite has made
        # self-contained.  A reader racing the replace follows HEAD and
        # sees
        # either the delta (parents still on disk) or the checkpoint.
        for name in sorted(keep):
            try:
                raw = self._load_raw(name)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            if not raw.get("delta"):
                continue
            folded = self._fold_by_name(name)
            # overrides AFTER the spread: the folded dict carries the
            # delta's chain_len, which must not leak into a checkpoint
            doc = {
                **{k: v for k, v in folded.items() if not k.startswith("_")},
                "format": 2,
                "chain_len": 0,
            }
            doc.pop("delta", None)
            doc.pop("parent", None)
            # wide tables: the rewrite checkpoints shard too — only the
            # shards dirtied since the chain's base are rewritten
            rewrite_state = dict(folded)
            self._maybe_shard_checkpoint(
                doc,
                rewrite_state,
                dict(folded.get("_shard_map", {})),
                set(folded.get("_dirty_buckets", ())),
            )
            mpath = os.path.join(mdir, name)
            with open(mpath + ".tmp", "w") as fh:
                json.dump(doc, fh)
            os.replace(mpath + ".tmp", mpath)
            self._fold_cache = (
                name,
                {**rewrite_state, "chain_len": 0, "_name": name},
            )
        live_snapshots: set[str] = set()
        live_changes: set[str] = set()
        live_shards: set[str] = set()
        for name in keep:
            try:
                man = self._fold_by_name(name)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            for rel in man["buckets"].values():
                live_snapshots.add(rel.split("/")[1])  # snapshots/<sid>/...
            for chain in man.get("deltas", {}).values():
                for rel in chain:
                    live_snapshots.add(rel.split("/")[1])
            for rel in self._changes_map(man, for_gc=True).values():
                live_changes.add(rel.split("/", 1)[1])  # changes/<dir>
            live_shards.update(man.get("_shard_map", {}).values())
            live_snapshots.add(f"s{man['snapshot_id']:08d}")
        def _rm_sized(full: str) -> int:
            freed = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(full)
                for f in fs
            )
            _shutil.rmtree(full, ignore_errors=True)
            return freed

        sdir = os.path.join(self.root, "snapshots")
        stats = {"snapshots_removed": 0, "manifests_removed": 0, "bytes_freed": 0}
        # a concurrent writer's CLAIMED-but-uncommitted dir always has a
        # higher id than anything a committed manifest references
        # (_claim_snapshot_dir claims above the max existing id) — those
        # are protected while RECENT (age guard), so GC can run
        # alongside a live writer; an abandoned claim becomes
        # collectible once stale or once later commits reference higher
        # dirs.  Dirs at-or-below the kept max are plain unreferenced
        # garbage regardless of age.
        import time as _time

        max_live = max(
            (
                int(m.group(1))
                for d in live_snapshots
                if (m := _SNAP_DIR_RE.match(d))
            ),
            default=-1,
        )
        for d in os.listdir(sdir):
            if d in live_snapshots:
                continue
            full = os.path.join(sdir, d)
            dm = _SNAP_DIR_RE.match(d)
            if dm is not None and int(dm.group(1)) > max_live:
                try:
                    if _time.time() - os.path.getmtime(full) <= orphan_age_seconds:
                        continue  # possibly a live writer's claim
                except OSError:
                    continue
            stats["bytes_freed"] += _rm_sized(full)
            stats["snapshots_removed"] += 1
        for name in names:
            if name not in keep:
                os.remove(os.path.join(mdir, name))
                stats["manifests_removed"] += 1
        # crash debris from _write_manifest (content temp linked-or-not);
        # an AGE guard keeps GC from unlinking a concurrent writer's
        # temp in the instant between its write and its link
        for f in os.listdir(mdir):
            fp = os.path.join(mdir, f)
            try:
                stale = _time.time() - os.path.getmtime(fp) > orphan_age_seconds
            except OSError:
                continue
            if f.endswith(".inflight") and stale:
                os.remove(fp)
        # checkpoint shard files referenced by no kept manifest; same
        # age guard (a racing writer writes shards BEFORE its manifest
        # link, so fresh unreferenced shards may be about to be linked)
        shdir = os.path.join(mdir, "shards")
        if os.path.isdir(shdir):
            for f in os.listdir(shdir):
                fp = os.path.join(shdir, f)
                if f"shards/{f}" in live_shards:
                    continue
                try:
                    if _time.time() - os.path.getmtime(fp) > orphan_age_seconds:
                        stats["bytes_freed"] += os.path.getsize(fp)
                        os.remove(fp)
                except OSError:
                    continue
        # change-audit dirs not referenced by any retained manifest
        # (crash debris or pre-truncate history) are garbage too
        cdir = os.path.join(self.root, "changes")
        if os.path.isdir(cdir):
            for d in os.listdir(cdir):
                if d not in live_changes:
                    stats["bytes_freed"] += _rm_sized(os.path.join(cdir, d))
        return stats

    def truncate(self, batch_id: int | None = None) -> None:
        """Commit-conflict-retrying wrapper (see ``apply_batch``)."""
        return self._retry_conflicts(lambda: self._truncate_attempt(batch_id))

    def _truncate_attempt(self, batch_id: int | None = None) -> None:
        """TRUNCATE (E4 PostgresTruncator, chomper/contrib/postgres.py:262-292;
        E10 sql Truncator, chomper/contrib/sql/exporters.py:325-333):
        atomically flip to an empty snapshot — the full-refresh precursor
        pattern (examples/companies.py:13).  The batch ledger is preserved
        (truncation is table history, not a reset of exactly-once
        tracking); pass ``batch_id`` to make the truncation replay-safe."""
        manifest = self.current_manifest()
        if batch_id is not None:
            if batch_id < 0:
                raise ValueError(f"batch_id must be >= 0, got {batch_id}")
            if _ledger_contains(manifest, batch_id):
                return
            wm, recent = _ledger_add(manifest, batch_id)
        else:
            wm = manifest["batch_watermark"] if manifest else -1
            recent = list(manifest.get("recent_batches", ())) if manifest else []
        schema = (
            manifest["schema"]
            if manifest
            else json.dumps(
                _meta_schema(
                    T.StructType(S.TRANSCRIPT.fields), audit=self.audit_timestamps
                ).jsonValue()
            )
        )
        self._commit(
            {
                "snapshot_id": (manifest["snapshot_id"] + 1) if manifest else 0,
                "batch_watermark": wm,
                "recent_batches": list(recent),
                "buckets": {},
                "deltas": {},
                # full refresh also resets the visible change history —
                # the orphaned dirs are GC'd by expire_snapshots
                "changes": {},
                "schema": schema,
                # no live files → single-version history
                "schema_history": [{"from_snapshot": 0, "schema": schema}],
                "key_cols": self.key_cols,
                "bucket_cols": self.bucket_cols,
                "n_buckets": self.n_buckets,
            },
            force_full=True,  # the reset must not be expressed as a delta
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
