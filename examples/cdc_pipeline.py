"""End-to-end example — the reference's examples/companies.py pattern
(truncate → feed → drop → map → filter → assign → upsert,
/root/reference/examples/companies.py:10-23) rebuilt as one Spark job.

Run:  python examples/cdc_pipeline.py [state_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from chomper_spark.operators import transforms as tx  # noqa: E402
from chomper_spark.operators.merge import SnapshotMergeSink  # noqa: E402
from chomper_spark.session import get_spark  # noqa: E402
from chomper_spark.sources.feed import synthetic_change_feed  # noqa: E402


def main() -> None:
    state = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cdc_demo_")
    spark = get_spark("cdc-pipeline-example", master="local[8]", shuffle_partitions=16)

    # 1. full-refresh precursor (reference: PostgresTruncator first in
    #    pipeline).  No batch_id: this demo truncate is unconditional —
    #    a replay-safe truncate would reserve a real id (e.g. batch 0)
    #    ahead of the data batches.
    sink = SnapshotMergeSink(spark, state, n_buckets=32, write_mode="mor")
    sink.truncate()

    # 2. feed → declarative transform pipeline (reference: CsvFeeder →
    #    Dropper → Mapper → Filter → Assigner), composed as ONE lazy plan
    feed = synthetic_change_feed(spark, 100_000, n_convs=2_000, zipf_skew=1.0, seed=42)
    feed = tx.pipe(
        feed,
        tx.drop_rows(F.col("role") == "system"),             # Dropper
        tx.map_values("tool", {"browser": "web_browser"}),   # Mapper (value mode)
        tx.scalar_map("text", lambda c: F.trim(c)),          # Filter
        tx.assign("ingested_by", "cdc_pipeline_example"),    # Assigner → new column
    )

    # 3. upsert (reference: PostgresUpserter, per-row SELECT+UPDATE/INSERT)
    #    → idempotent micro-batched MERGE; the new column evolves the table.
    #    Batch ids continue from the table's ledger watermark: truncate
    #    preserves exactly-once history, so a re-run against the same
    #    state_dir must use FRESH ids (reused ids are ledger-skipped —
    #    that is the replay protection working, not a bug).
    base = (sink.current_manifest() or {}).get("batch_watermark", -1) + 1
    for b in range(4):
        # hash-split so batches don't align with the role pattern above
        batch = feed.filter(F.pmod(F.xxhash64("batch_seq"), F.lit(4)) == b)
        m = sink.apply_batch(batch, batch_id=base + b, collect_metrics=True)
        print(
            f"batch {base + b}: in={m.events_in} merged={m.merge_rows} "
            f"dedup_drops={m.dedup_drops} buckets={m.buckets_touched} "
            f"schema_added={m.schema_added}"
        )

    table = sink.read()
    print(f"final table: {table.count()} rows")
    table.orderBy("conv_id", "turn_idx").show(5, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
