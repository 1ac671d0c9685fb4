"""Property-based replay testing: random change feeds, random batch
splits and out-of-order timestamps — the engine's final table must
always equal the single-threaded pandas reference applier (SURVEY.md §5:
the reference asserts final-table state after upsert sequences; we
generalize it with hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chomper_spark.operators.merge import SnapshotMergeSink
from tests.helpers import assert_state_equals_oracle, ev, feed_df

_event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["c0", "c1", "c2"]),
    st.integers(min_value=0, max_value=2),   # turn_idx
    st.integers(min_value=0, max_value=40),  # op_ts seconds (dupes allowed)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(_event, min_size=1, max_size=24),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_random_replay_matches_reference(spark, tmp_path_factory, events, n_batches):
    # batch_seq = arrival order (unique, the binlog tiebreaker);
    # op_ts drawn independently → out-of-order arrivals are common.
    evs = [
        ev(op, conv, turn, seq, secs=ts, text=f"t{seq}")
        for seq, (op, conv, turn, ts) in enumerate(events)
    ]
    root = str(tmp_path_factory.mktemp("prop") / "table")
    sink = SnapshotMergeSink(spark, root, n_buckets=4)
    for b in range(n_batches):
        chunk = evs[b::n_batches]  # interleaved split → late events cross batches
        if chunk:
            sink.apply_batch(feed_df(spark, chunk), batch_id=b)
    assert_state_equals_oracle(sink.read(), evs)
