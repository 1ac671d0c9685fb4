"""spark-submit entry point: CDC replay / continuous tail.

Cluster usage (north rule: runs via spark-submit --py-files at N and
4N executors):

    cd /root/repo && zip -r /tmp/chomper_spark.zip chomper_spark
    spark-submit --py-files /tmp/chomper_spark.zip \
        --master <cluster> --num-executors <N> \
        jobs/replay_job.py \
        --feed-dir /data/feed --state-root /data/state \
        --checkpoint /data/ckpt --lineage /data/lineage \
        --mode stream --n-buckets 256

Modes:
  batch   — drain the feed dir once (availableNow) and exit
  stream  — continuous micro-batch tail (processingTime trigger)

Sandbox note: the same script runs under plain `python` on local[N];
tools/scaling_bench.py uses the identical apply path at local[8] vs
local[32] for the two-cluster-size scaling evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit ships the package via --py-files; plain `python
# jobs/replay_job.py` needs the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--feed-dir", required=True)
    ap.add_argument("--state-root", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--mode", choices=["batch", "stream"], default="batch")
    ap.add_argument("--trigger", default="10 seconds")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--stage-partitions", type=int, default=None)
    ap.add_argument("--metrics", action="store_true", help="collect per-batch merge metrics")
    args = ap.parse_args(argv)

    # spark-submit provides the session config; only defaults are set here
    from chomper_spark.session import get_spark
    from chomper_spark.streaming import StreamingApply

    spark = get_spark("chomper-spark-replay")
    app = StreamingApply(
        spark,
        feed_dir=args.feed_dir,
        state_root=args.state_root,
        checkpoint_dir=args.checkpoint,
        lineage_root=args.lineage,
        watermark=args.watermark,
        max_files_per_trigger=args.max_files_per_trigger,
        n_buckets=args.n_buckets,
        stage_partitions=args.stage_partitions,
        collect_metrics=args.metrics,
    )
    if args.mode == "batch":
        app.run_available()
        for m in app.batch_metrics:
            print(json.dumps(m.as_dict()), file=sys.stderr)
        table = app.read()
        print(json.dumps({"final_rows": table.count() if table is not None else 0}))
    else:
        q = app.start(available_now=False, processing_time=args.trigger)
        q.awaitTermination()


if __name__ == "__main__":
    main()
