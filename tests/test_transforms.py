"""Unit tests per transform — the reference's processor semantics
(tests/test_processors.py:48-177) on tiny DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from chomper_spark.operators import transforms as tx


def _df(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "user", "hello", None),
            ("c1", 1, "assistant", None, "browser"),
            ("c2", 0, "system", "", "search"),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )


def test_defaults_only_null_triggers(spark):
    # falsy-but-not-null values are kept (reference tests/test_processors.py:48-55)
    out = tx.pipe(_df(spark), tx.defaults({"text": "<missing>", "new_col": 7}))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
    assert rows[("c1", 1)]["text"] == "<missing>"
    assert rows[("c2", 0)]["text"] == ""  # falsy kept
    assert all(r["new_col"] == 7 for r in rows.values())


def test_assign_static_and_computed(spark):
    out = tx.pipe(
        _df(spark),
        tx.assign("source", "cdc"),
        tx.assign("turn2", F.col("turn_idx") * 2),
    )
    r = out.filter("conv_id = 'c1' and turn_idx = 1").collect()[0]
    assert r["source"] == "cdc" and r["turn2"] == 2


def test_drop_rows_and_nullify_field(spark):
    out = tx.pipe(
        _df(spark),
        tx.drop_rows(F.col("role") == "system"),
        tx.nullify_field("tool", F.col("role") == "assistant"),
    )
    rows = out.collect()
    assert all(r["role"] != "system" for r in rows)
    assert all(r["tool"] is None for r in rows if r["role"] == "assistant")


def test_scalar_map_skips_null(spark):
    out = tx.pipe(_df(spark), tx.scalar_map("text", lambda c: F.upper(c)))
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.collect()}
    assert rows[("c1", 0)] == "HELLO"
    assert rows[("c1", 1)] is None  # null passthrough, no error


def test_map_values_passthrough_on_missing_key(spark):
    out = tx.pipe(_df(spark), tx.map_values("role", {"user": "U"}))
    roles = {r["role"] for r in out.collect()}
    assert roles == {"U", "assistant", "system"}


def test_rename_pick_omit(spark):
    out = tx.pipe(
        _df(spark),
        tx.rename({"conv_id": "cid"}),
        tx.omit(["tool"]),
        tx.pick(["cid", "turn_idx"]),
    )
    assert out.columns == ["cid", "turn_idx"]


def test_lookup_join_is_broadcast(spark):
    lookup = spark.createDataFrame([("user", "human"), ("assistant", "bot")], "role string, kind string")
    out = tx.pipe(_df(spark), tx.lookup_join(lookup, on=["role"]))
    kinds = {r["role"]: r["kind"] for r in out.collect()}
    assert kinds["user"] == "human" and kinds["system"] is None
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_vectorized_map_fanout(spark):
    # generator-returning pipeline funcs (1→N) via mapInPandas
    def dup(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.concat([pdf, pdf.assign(turn_idx=pdf.turn_idx + 100)])

    out = tx.pipe(
        _df(spark).select("conv_id", "turn_idx"),
        tx.vectorized_map("conv_id string, turn_idx int", dup),
    )
    assert out.count() == 6


def test_fanout_explode(spark):
    df = spark.createDataFrame([("c1", [1, 2, 3])], "conv_id string, xs array<int>")
    out = tx.pipe(df, tx.fanout("xs", "x"))
    assert out.count() == 3


def test_branch_multicast(spark):
    df = _df(spark)
    left, right = tx.branch(
        df,
        [tx.drop_rows(F.col("role") != "user"), tx.pick(["conv_id"])],
        [tx.pick(["conv_id", "role"])],
    )
    assert left.count() == 1 and right.count() == 3
    df.unpersist()


def test_tap_observe_metrics(spark):
    out = tx.pipe(_df(spark), tx.tap("m", F.count(F.lit(1)).alias("rows")))
    out.collect()


def test_no_python_row_udfs_in_plans(spark):
    # input_hint: no per-row Python — core transforms must not plan a
    # BatchEvalPython node (SURVEY.md §7.3 enforcement test).
    df = tx.pipe(
        _df(spark),
        tx.defaults({"text": ""}),
        tx.assign("n", F.length("text")),
        tx.map_values("role", {"user": "U"}),
        tx.drop_rows(F.col("turn_idx") < 0),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_assign_surrogate_id_deterministic_and_distinct(spark):
    out = tx.pipe(
        _df(spark), tx.assign_surrogate_id("row_id", ["conv_id", "turn_idx"])
    )
    a = {(r["conv_id"], r["turn_idx"]): r["row_id"] for r in out.collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["row_id"] for r in out.collect()}
    assert a == b and len(set(a.values())) == 3  # stable across runs, unique per key


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [("c1", t) for t in [0, 1, 2, 10, 11, 30]] + [("c2", 5)],
        "conv_id string, turn_idx int",
    )
    out = tx.pipe(df, tx.sessionize(gap_turns=4))
    sess = {(r["conv_id"], r["turn_idx"]): r["session_id"] for r in out.collect()}
    assert sess[("c1", 0)] == sess[("c1", 2)] == 1
    assert sess[("c1", 10)] == sess[("c1", 11)] == 2
    assert sess[("c1", 30)] == 3 and sess[("c2", 5)] == 1


def test_asof_join_semantics_including_equal_ts(spark):
    from chomper_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k1", 10, "e1"), ("k1", 20, "e2"), ("k1", 5, "e0"), ("k2", 10, "e3")],
        "k string, ts int, ev string",
    )
    right = spark.createDataFrame(
        [("k1", 10, "r@10"), ("k1", 15, "r@15"), ("k9", 1, "r-other")],
        "k string, ts int, v string",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
    assert got[("k1", 5)] is None          # nothing at-or-before
    assert got[("k1", 10)] == "r@10"       # equal ts IS visible (<=)
    assert got[("k1", 20)] == "r@15"       # latest prior wins
    assert got[("k2", 10)] is None         # key with no right rows
    assert len(got) == 4                   # left join: all left rows kept


def test_asof_join_null_column_no_splice(spark):
    # the latest right row has a legitimate NULL in one value column —
    # the output must carry that row's image ATOMICALLY, not splice the
    # NULL column from an older right row (DuckDB ASOF semantics)
    from chomper_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k1", 30, "e")], "k string, ts int, ev string")
    right = spark.createDataFrame(
        [("k1", 10, "old_v", "old_w"), ("k1", 20, None, "new_w")],
        "k string, ts int, v string, w string",
    )
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()[0]
    assert row["w"] == "new_w"
    assert row["v"] is None  # NOT "old_v" — no mixed row image


def test_asof_join_chunked_matches_unchunked_on_hot_key(spark):
    # time-chunk salting: identical semantics, bounded per-task windows
    from chomper_spark.operators.asof import asof_join

    # hot key: 500 left events + 50 right updates on one key, plus a
    # normal key and a right-less key; chunk boundaries cut both inside
    # and between right updates
    left = spark.createDataFrame(
        [("hot", t, f"e{t}") for t in range(500)]
        + [("cold", 7, "c7"), ("bare", 3, "b3")],
        "k string, ts int, ev string",
    )
    right = spark.createDataFrame(
        [("hot", t * 10 + 1, f"v{t}") for t in range(50)] + [("cold", 5, "cv")],
        "k string, ts int, v string",
    )
    base = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    chunked = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", chunk_seconds=37
    )
    a = {(r["k"], r["ts"]): r["v"] for r in base.collect()}
    b = {(r["k"], r["ts"]): r["v"] for r in chunked.collect()}
    assert a == b and len(a) == 502
    assert a[("hot", 499)] == "v49" and a[("hot", 0)] is None
    assert a[("cold", 7)] == "cv" and a[("bare", 3)] is None


def test_asof_join_auto_chunks_hot_keys_without_flag(spark):
    # the skew-hardened path must be the DEFAULT at scale: with no
    # caller flag, the auto probe detects the hot key and windows the
    # bulk data on (key, chunk) — bounded per-task input — while a
    # thin-key call stays on the single-window plan (no chunk column)
    from chomper_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("hot", t, f"e{t}") for t in range(400)] + [("cold", 7, "c7")],
        "k string, ts int, ev string",
    )
    right = spark.createDataFrame(
        [("hot", t * 10 + 1, f"v{t}") for t in range(40)] + [("cold", 5, "cv")],
        "k string, ts int, v string",
    )
    auto = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     auto_hot_rows=100)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_asof_chunk" in plan  # chunked form chosen without a flag
    # per-(key, chunk) occupancy is bounded near the requested budget:
    # 440 tagged hot rows / 100 => ceil 5 chunks over the ts span
    forced = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                       chunk_seconds=None)
    a = {(r["k"], r["ts"]): r["v"] for r in auto.collect()}
    f = {(r["k"], r["ts"]): r["v"] for r in forced.collect()}
    assert a == f and len(a) == 401
    thin = asof_join(left.limit(50), right, on=["k"], left_ts="ts", right_ts="ts",
                     auto_hot_rows=100)
    assert "_asof_chunk" not in thin._jdf.queryExecution().executedPlan().toString()


def test_importer_pipeline_counters(spark, tmp_path):
    # the reference's Importer shape: name + pipeline + counters
    # (chomper/importers.py:25-89; items_processed/items_dropped :44-45)
    from chomper_spark.operators.merge import SnapshotMergeSink
    from chomper_spark.plans import Importer
    from tests.helpers import ev, feed_df

    events = [
        ev("I", "c1", 0, 1, role="user"),
        ev("I", "c1", 1, 2, role="system"),   # dropped by pipeline
        ev("U", "c1", 0, 3, role="user"),     # dedup-merged into c1/0
        ev("I", "c2", 0, 4, role="user"),
    ]
    imp = Importer(
        name="transcripts",
        feeder=lambda s: feed_df(s, events),
        pipeline=[tx.drop_rows(F.col("role") == "system")],
        sink=SnapshotMergeSink(spark, str(tmp_path / "t"), n_buckets=2),
    )
    res = imp.run(spark, batch_id=0, collect_metrics=True)
    assert res.items_processed == 2  # c1/0 (latest), c2/0
    assert res.items_dropped == 2    # 1 filtered + 1 dedup-superseded
    assert imp.sink.read().count() == 2
    # sink-less mode: pure transform counters
    imp2 = Importer("noop", lambda s: feed_df(s, events),
                    [tx.drop_rows(F.col("role") == "system")])
    res2 = imp2.run(spark)
    assert (res2.items_processed, res2.items_dropped) == (3, 1)


def test_importer_run_adds_no_jobs_over_bare_apply(spark, tmp_path):
    # the input counter must RIDE the sink's own jobs (df.observe), not
    # cost an extra count() action: importer.run spends exactly as many
    # Spark jobs as a bare apply_batch of the same feed
    from chomper_spark.operators.merge import SnapshotMergeSink
    from chomper_spark.plans import Importer
    from tests.helpers import ev, feed_df

    events = [ev("I", f"c{i}", 0, i) for i in range(8)]

    def jobs(fn):
        sc = spark.sparkContext
        before = sc._jsc.sc().dagScheduler().nextJobId()
        fn()
        return sc._jsc.sc().dagScheduler().nextJobId() - before

    bare_sink = SnapshotMergeSink(spark, str(tmp_path / "bare"), n_buckets=4)
    n_bare = jobs(lambda: bare_sink.apply_batch(feed_df(spark, events), 0))

    imp_sink = SnapshotMergeSink(spark, str(tmp_path / "imp"), n_buckets=4)
    imp = Importer("t", feeder=lambda s: feed_df(s, events), sink=imp_sink)
    res = {}
    n_imp = jobs(lambda: res.update(r=imp.run(spark, batch_id=0)))
    assert n_imp == n_bare
    assert res["r"].items_processed == 8 and res["r"].items_dropped == 0


def test_asof_auto_width_follows_hot_key_own_span(spark):
    # review catch: the width must derive from the HOT KEY's own time
    # span — a time-concentrated hot key must still be split even when
    # another thin key's events span a vastly wider range
    from chomper_spark.operators.asof import _auto_chunk_seconds, _tag_sides

    left = spark.createDataFrame(
        # hot key: 300 rows inside [0, 300); thin key: 2 rows spanning 10^9
        [("hot", t, f"e{t}") for t in range(300)]
        + [("wide", 0, "w0"), ("wide", 1_000_000_000, "w1")],
        "k string, ts int, ev string",
    )
    right = spark.createDataFrame([("hot", 1, "v")], "k string, ts int, v string")
    tagged, _ = _tag_sides(left, right, ["k"], "ts", "ts", ["v"])
    w = _auto_chunk_seconds(tagged, ["k"], hot_rows=100)
    # 301 tagged hot rows / 100 => 4 chunks over hot's ~300s span: width
    # ~75s, NOT the ~2.5e8 a global-span derivation would give
    assert w is not None and w < 300
    # and per-(key, chunk) occupancy is actually bounded
    from pyspark.sql import functions as F

    chunks = tagged.filter(F.col("k") == "hot").select(
        F.floor(F.col("_asof_ts") / F.lit(w)).alias("c")
    ).groupBy("c").count()
    assert max(r["count"] for r in chunks.collect()) <= 110


def test_asof_auto_probe_scan_prunes_to_key_and_ts(spark):
    # the probe must never re-read payload columns: its scan prunes to
    # exactly the join key + timestamp (struct projections fall away)
    from pyspark.sql import functions as F

    from chomper_spark.operators.asof import _tag_sides, _ts_seconds

    ev_df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev_df.select("user_id", "ts", "event_type", "value", "props")
    right = ev_df.select("user_id", F.col("ts").alias("rts"), F.col("value").alias("v"))
    tagged, _ = _tag_sides(left, right, ["user_id"], "ts", "rts", ["v"])
    ts = _ts_seconds(tagged.schema["_asof_ts"].dataType)
    per_key = tagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("_n"), F.min(ts).alias("_mn"), F.max(ts).alias("_mx")
    )
    plan = per_key._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:")[1]
            assert "value" not in schema_part and "props" not in schema_part
