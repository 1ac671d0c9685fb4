"""spark-submit entry point: table maintenance (GC + retention).

A continuous CDC tail commits one snapshot per micro-batch; without
periodic maintenance the state root grows O(batches × table) and the
lineage table O(batches).  Run this on a schedule (or after N batches)
against the same roots the ingest job writes:

    spark-submit --py-files /tmp/chomper_spark.zip jobs/maintain_job.py \
        --state-root /data/state --lineage /data/lineage \
        --keep-manifests 48 --keep-lineage-batches 10000

Maintenance is safe to run concurrently with readers: expire only
deletes snapshot/change dirs referenced by NO retained manifest (with
an age guard protecting a live writer's in-flight claims), and HEAD
resolution is atomic.  Since round 5 it is also safe to run
concurrently with the WRITER: commits are published with a
compare-and-swap (exclusive manifest link), so a compact() racing the
streaming apply loses cleanly, re-reads HEAD, and retries — never a
silent last-wins clobber.  (On Iceberg this maps to
`expire_snapshots` + a lineage-table DELETE under optimistic commit.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--state-root", required=True)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--keep-manifests", type=int, default=48,
                    help="time-travel horizon: snapshots older than the "
                         "newest N manifests are unreachable and GC'd")
    ap.add_argument("--keep-lineage-batches", type=int, default=10_000)
    ap.add_argument("--describe", action="store_true",
                    help="print the table summary (metadata only) and exit "
                         "without compacting or expiring anything")
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--compact", action="store_true",
                    help="fold all MOR delta chains into fresh bases first")
    args = ap.parse_args(argv)

    from chomper_spark.operators.lineage import LineageTable
    from chomper_spark.operators.merge import SnapshotMergeSink
    from chomper_spark.session import get_spark

    spark = get_spark("chomper-spark-maintain")
    report: dict = {}
    sink = SnapshotMergeSink(spark, args.state_root, n_buckets=args.n_buckets)
    if sink.current_manifest() is None:
        # a mistyped --state-root would otherwise crash inside
        # expire_snapshots (no _CURRENT) after the constructor already
        # dropped stub snapshots/manifests dirs there
        print(json.dumps({"error": f"no table at {args.state_root} "
                          "(never created — check --state-root)"}))
        spark.stop()
        raise SystemExit(2)
    if args.describe:
        print(json.dumps(sink.describe()))
        spark.stop()
        return
    if args.compact:
        report["compaction"] = sink.compact()
    report["snapshots"] = sink.expire_snapshots(keep_manifests=args.keep_manifests)
    if args.lineage and os.path.isdir(args.lineage):
        report["lineage"] = LineageTable(spark, args.lineage).expire(
            keep_batches=args.keep_lineage_batches
        )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
