"""Merge-on-read mode: O(batch) delta appends + read-side latest-wins
reduce + inline compaction must be observationally identical to the
copy-on-write MERGE (same oracle, same exactly-once)."""

from __future__ import annotations

import pytest

from chomper_spark.operators.merge import SnapshotMergeSink
from tests.helpers import assert_state_equals_oracle, ev, feed_df


def _mor(spark, path, **kw):
    return SnapshotMergeSink(spark, str(path), n_buckets=4, write_mode="mor", **kw)


def test_mor_matches_oracle_with_deletes_and_out_of_order(spark, tmp_path):
    b0 = [ev("I", "c1", 0, 10, text="newer"), ev("I", "c2", 0, 2)]
    b1 = [ev("U", "c1", 0, 5, text="stale, must lose"), ev("D", "c2", 0, 7)]
    b2 = [ev("I", "c2", 0, 9, text="resurrected"), ev("I", "c3", 1, 11)]
    sink = _mor(spark, tmp_path / "t")
    for i, b in enumerate([b0, b1, b2]):
        sink.apply_batch(feed_df(spark, b), i)
    assert_state_equals_oracle(sink.read(), b0 + b1 + b2)
    texts = {r["conv_id"]: r["text"] for r in sink.read().collect()}
    assert texts["c1"] == "newer" and texts["c2"] == "resurrected"


def test_mor_equals_cow_final_state(spark, tmp_path):
    from chomper_spark.sources.feed import synthetic_change_feed, with_batch_id
    from pyspark.sql import functions as F

    feed = with_batch_id(
        synthetic_change_feed(spark, 4000, n_convs=80, zipf_skew=1.0, seed=3), 3
    ).persist()
    cow = SnapshotMergeSink(spark, str(tmp_path / "cow"), n_buckets=4)
    mor = _mor(spark, tmp_path / "mor", mor_compact_threshold=2)
    for b in range(3):
        batch = feed.filter(F.col("batch_id") == b).drop("batch_id")
        cow.apply_batch(batch, b, collect_metrics=False)
        mor.apply_batch(batch, b, collect_metrics=False)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = cow.read().select(cols).toPandas().sort_values(cols[:2]).reset_index(drop=True)
    b_ = mor.read().select(cols).toPandas().sort_values(cols[:2]).reset_index(drop=True)
    feed.unpersist()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b_)


def test_mor_ledger_skips_replay(spark, tmp_path):
    events = [ev("I", "c1", 0, 1), ev("U", "c1", 0, 2)]
    sink = _mor(spark, tmp_path / "t")
    m0 = sink.apply_batch(feed_df(spark, events), 0)
    m1 = sink.apply_batch(feed_df(spark, events), 0)
    assert not m0.skipped and m1.skipped
    assert sink.read().count() == 1
    assert_state_equals_oracle(sink.read(), events)


def test_mor_compaction_bounds_delta_chains(spark, tmp_path):
    sink = _mor(spark, tmp_path / "t", mor_compact_threshold=3)
    all_events = []
    for i in range(7):
        b = [ev("U" if i else "I", "c1", 0, i, text=f"v{i}"), ev("I", f"x{i}", 0, 100 + i)]
        all_events += b
        sink.apply_batch(feed_df(spark, b), i)
    man = sink.current_manifest()
    assert all(len(v) < 3 for v in man.get("deltas", {}).values())
    assert man["buckets"], "compaction must have produced base files"
    assert_state_equals_oracle(sink.read(), all_events)
    # GC after many snapshots keeps the table readable
    before = sorted(r["conv_id"] for r in sink.read().collect())
    sink.expire_snapshots(keep_manifests=1)
    assert sorted(r["conv_id"] for r in sink.read().collect()) == before


def test_mor_rejects_preimage_modes(spark, tmp_path):
    sink = _mor(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="cow"):
        sink.apply_batch(feed_df(spark, [ev("I", "c1", 0, 1)]), 0, update_only_nulls=True)


def test_mor_schema_evolution_is_metadata_only(spark, tmp_path):
    from pyspark.sql import functions as F

    sink = _mor(spark, tmp_path / "t", mor_compact_threshold=99)
    sink.apply_batch(feed_df(spark, [ev("I", "c1", 0, 1)]), 0)
    b2 = feed_df(spark, [ev("I", "c2", 0, 2)]).withColumn("tool_meta", F.lit("v2"))
    m = sink.apply_batch(b2, 1)
    assert m.schema_added == ["tool_meta"]
    rows = {r["conv_id"]: r for r in sink.read().collect()}
    assert rows["c2"]["tool_meta"] == "v2" and rows["c1"]["tool_meta"] is None
    # metadata-only: batch 0's old-schema delta chain was NOT rewritten —
    # the commit recorded a new schema_history entry instead
    man = sink.current_manifest()
    assert man["deltas"]
    assert len(man["schema_history"]) == 2
    # lazy completion: upgrade-compaction folds everything to the
    # current schema and collapses the history
    rep = sink.compact(upgrade_schema=True)
    assert rep["buckets_compacted"] >= 1
    man2 = sink.current_manifest()
    assert man2["deltas"] == {} and len(man2["schema_history"]) == 1
    rows2 = {r["conv_id"]: r for r in sink.read().collect()}
    assert rows2["c2"]["tool_meta"] == "v2" and rows2["c1"]["tool_meta"] is None


def test_streaming_apply_in_mor_mode(spark, tmp_path):
    from chomper_spark.streaming import StreamingApply
    from tests.helpers import feed_df

    feed_dir = str(tmp_path / "feed")
    c1 = [ev("I", "c1", 0, 1), ev("I", "c2", 0, 2)]
    c2 = [ev("U", "c1", 0, 3, text="v2"), ev("D", "c2", 0, 4)]
    for chunk in (c1, c2):
        feed_df(spark, chunk).coalesce(1).write.mode("append").parquet(feed_dir)
    app = StreamingApply(
        spark, feed_dir, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, n_buckets=4, write_mode="mor",
    )
    app.run_available()
    assert_state_equals_oracle(
        app.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
        c1 + c2,
    )


def test_mor_write_never_mutates_shared_session_conf(spark, tmp_path):
    # the round-2 AQE-off toggle around the MOR write mutated SHARED
    # session conf (a concurrently-planned COW join could observe AQE
    # disabled and lose skew handling); it is gone — the write runs with
    # the session conf untouched and metrics still ride the write job.
    sink = SnapshotMergeSink(spark, str(tmp_path / "t"), n_buckets=4, write_mode="mor")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    m = sink.apply_batch(
        feed_df(spark, [ev("I", "c1", 0, 1), ev("U", "c1", 0, 2), ev("I", "c2", 0, 3)]),
        batch_id=0, collect_metrics=True,
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (m.events_in, m.merge_rows, m.dedup_drops) == (3, 2, 1)


def _data_files(root):
    import os
    out = []
    for r, _, fs in os.walk(root):
        out += [os.path.join(r, f) for f in fs if f.endswith(".parquet")]
    return out


def test_mor_single_file_delta_layout(spark, tmp_path):
    # delta_layout="single": each micro-batch writes ONE delta file
    # (bucket id as a data column) instead of one per bucket — the
    # layout for small/frequent streaming triggers where per-bucket
    # files explode file counts at scale.  Semantics are identical:
    # deletes, out-of-order, partial-bucket reads, compaction, GC.
    b0 = [ev("I", "c1", 0, 10, text="newer"), ev("I", "c2", 0, 2)]
    b1 = [ev("U", "c1", 0, 5, text="stale, must lose"), ev("D", "c2", 0, 7)]
    b2 = [ev("I", "c2", 0, 9, text="resurrected"), ev("I", "c3", 1, 11)]
    sink = _mor(spark, tmp_path / "t")
    all_ev = []
    for i, b in enumerate([b0, b1, b2]):
        all_ev += b
        m = sink.apply_batch(feed_df(spark, b), i, delta_layout="single",
                             collect_metrics=True)
        assert m.buckets_touched >= 1
        snap_files = _data_files(
            str(tmp_path / "t" / "snapshots" / f"s{i:08d}"))
        assert len(snap_files) == 1  # ONE file per micro-batch
    assert_state_equals_oracle(sink.read(), all_ev)
    texts = {r["conv_id"]: r["text"] for r in sink.read().collect()}
    assert texts == {"c1": "newer", "c2": "resurrected", "c3": "text c3/1 v11"}
    # partial-bucket reads bucket-filter the shared file: a point lookup
    # must not surface foreign-bucket rows
    one = sink.read_keys([("c1", 0)]).collect()
    assert len(one) == 1 and one[0]["text"] == "newer"
    # mixed layouts interoperate
    sink.apply_batch(feed_df(spark, [ev("U", "c3", 1, 20, text="bk")]), 3,
                     delta_layout="bucketed")
    assert {r["conv_id"]: r["text"] for r in sink.read().collect()}["c3"] == "bk"
    # layout guardrails
    with pytest.raises(ValueError, match="bucketed.*single|single.*bucketed"):
        sink.apply_batch(feed_df(spark, b0), 9, delta_layout="nope")
    cow = SnapshotMergeSink(spark, str(tmp_path / "cow"), n_buckets=4)
    with pytest.raises(ValueError, match="mor"):
        cow.apply_batch(feed_df(spark, b0), 0, delta_layout="single")


def test_mor_single_layout_compaction_and_gc(spark, tmp_path):
    sink = _mor(spark, tmp_path / "t", mor_compact_threshold=3)
    all_ev = []
    for i in range(7):
        b = [ev("U" if i else "I", "c1", 0, i, text=f"v{i}"), ev("I", f"x{i}", 0, 100 + i)]
        all_ev += b
        sink.apply_batch(feed_df(spark, b), i, delta_layout="single")
    man = sink.current_manifest()
    assert all(len(v) < 3 for v in man.get("deltas", {}).values())
    assert_state_equals_oracle(sink.read(), all_ev)
    before = {(r["conv_id"], r["text"]) for r in sink.read().collect()}
    sink.expire_snapshots(keep_manifests=1)
    assert {(r["conv_id"], r["text"]) for r in sink.read().collect()} == before


def test_streaming_apply_single_delta_layout(spark, tmp_path):
    from chomper_spark.streaming import StreamingApply
    from tests.helpers import assert_state_equals_oracle as chk

    feed_dir = str(tmp_path / "feed")
    evs = []
    for b in range(3):
        chunk = [ev("I", f"c{b}", 0, b + 1), ev("U", "c0", 0, 10 + b, text=f"u{b}")]
        evs += chunk
        feed_df(spark, chunk).coalesce(1).write.mode("append").parquet(feed_dir)
    app = StreamingApply(
        spark, feed_dir, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, n_buckets=8, write_mode="mor",
        delta_layout="single",
    )
    app.run_available()
    chk(app.read(), evs)
    files = _data_files(str(tmp_path / "state" / "snapshots"))
    assert len(files) <= 3  # one delta file per micro-batch, not per bucket


def test_on_demand_compact_folds_all_chains(spark, tmp_path):
    # sink.compact(): the maintenance twin of inline compaction — folds
    # every delta chain (bucketed AND shared) into fresh bases, commits
    # one snapshot, and leaves reads identical
    sink = _mor(spark, tmp_path / "t", mor_compact_threshold=100)  # inline off
    all_ev = []
    for i in range(4):
        b = [ev("U" if i else "I", "c1", 0, i, text=f"v{i}"), ev("I", f"x{i}", 0, 50 + i)]
        all_ev += b
        sink.apply_batch(feed_df(spark, b), i,
                         delta_layout="single" if i % 2 else "bucketed")
    assert sink.current_manifest()["deltas"]
    before = {(r["conv_id"], r["text"]) for r in sink.read().collect()}
    rep = sink.compact()
    assert rep["buckets_compacted"] >= 1 and rep["delta_refs_folded"] >= 4
    man = sink.current_manifest()
    assert man["deltas"] == {} and man["buckets"]
    assert {(r["conv_id"], r["text"]) for r in sink.read().collect()} == before
    assert_state_equals_oracle(sink.read(), all_ev)
    # idempotent no-op on a compacted table; ledger untouched
    assert sink.compact() == {"buckets_compacted": 0, "delta_refs_folded": 0}
    assert sink.committed_batches() == {0, 1, 2, 3}
    # the batch ledger still skips replays after compaction
    assert sink.apply_batch(feed_df(spark, all_ev[:2]), 0).skipped


def test_table_properties_come_from_manifest_not_constructor(spark, tmp_path):
    # n_buckets/key_cols are TABLE properties: reopening an existing
    # table with different constructor values must honor the manifest —
    # otherwise a maintenance compact() with a default n_buckets
    # re-hashes rows into unreferenced dirs (silent data loss, caught
    # in round-3 review and reproduced before this guard existed)
    evs = [ev("I", f"c{i}", 0, i) for i in range(12)]
    sink = _mor(spark, tmp_path / "t")  # n_buckets=4
    sink.apply_batch(feed_df(spark, evs), 0)
    # reopen as a maintenance job would: wrong bucket count + key cols
    maint = SnapshotMergeSink(spark, str(tmp_path / "t"), n_buckets=256,
                              key_cols=["text_hash"], write_mode="mor")
    assert maint.n_buckets == 4 and maint.key_cols == ["conv_id", "turn_idx"]
    rep = maint.compact()
    assert rep["buckets_compacted"] >= 1
    assert maint.read().count() == 12  # every row survived
    assert maint.current_manifest()["n_buckets"] == 4
    assert_state_equals_oracle(maint.read(), evs)


def test_shared_delta_read_filters_per_referencing_bucket(spark, tmp_path):
    # partial-compaction hazard: a shared (delta_layout="single") file
    # holds rows of buckets {j, k}, but k's chain was folded into a
    # base and no longer references it.  A multi-bucket read must admit
    # the shared file's rows ONLY for buckets whose chains reference it
    # — not lean on the latest-wins reduce to re-hide folded rows.
    import os

    from pyspark.sql import functions as F

    sink = _mor(spark, tmp_path / "t", mor_compact_threshold=100)
    # batch 0 writes a shared delta holding rows of 2+ buckets
    rows = [ev("I", f"c{i}", 0, i) for i in range(12)]
    sink.apply_batch(feed_df(spark, rows), 0, delta_layout="single")
    man = sink.current_manifest()
    ref_buckets = sorted(int(k) for k in man["deltas"])
    assert len(ref_buckets) >= 2
    j, k = ref_buckets[0], ref_buckets[1]
    # simulate k's chain having been folded away: manifest stops
    # referencing the shared file for k (no base for k either — so any
    # k-row the read returns can only have leaked from the shared file)
    pruned = {
        "buckets": dict(man["buckets"]),
        "deltas": {kk: list(v) for kk, v in man["deltas"].items() if int(kk) != k},
        "schema": man["schema"],
    }
    got = sink._read_buckets(pruned, [j, k])
    got_buckets = {
        r["b"] for r in got.select(sink._bucket_expr().alias("b")).distinct().collect()
    }
    assert j in got_buckets and k not in got_buckets

    # mixed referencing sets across TWO shared files exercise the
    # per-file (input_file_name) branch: batch 1's shared file still
    # references k, batch 0's does not
    sink.apply_batch(
        feed_df(spark, [ev("U", f"c{i}", 0, 100 + i, text="v2") for i in range(12)]),
        1, delta_layout="single",
    )
    man2 = sink.current_manifest()
    mixed = {
        "buckets": dict(man2["buckets"]),
        "deltas": {
            kk: (list(v) if int(kk) != k else list(v)[1:])  # drop batch-0 ref for k
            for kk, v in man2["deltas"].items()
        },
        "schema": man2["schema"],
    }
    got2 = sink._read_buckets(mixed, [j, k])
    texts = {r["conv_id"]: r["text"] for r in got2.collect()}
    # k's rows come only from the batch-1 file (text v2); j's reduce
    # still sees both versions and picks v2 as well
    assert all(v == "v2" for v in texts.values())
    assert {r["conv_id"] for r in got2.collect()} == {
        r["conv_id"]
        for r in sink.read_state()
        .withColumn("b", sink._bucket_expr())
        .filter(F.col("b").isin([j, k]))
        .collect()
    }
